"""Pure-python torch checkpoint reader — no torch dependency.

Parses the torch zip serialization format (a zip archive containing
`data.pkl` plus one file per tensor storage), materializing tensors as
numpy arrays; the legacy non-zip pickle format is NOT supported here
(install torch for those). Used as the fallback loader in
`torch_ckpt.load_torch_state_dict` when torch isn't installed; with torch
present the torch loader is preferred (it covers every edge case).

Supports the standard dtypes (f32/f16/bf16/f64/i64/i32/i16/i8/u8/bool) and
`_rebuild_tensor_v2` with strided layouts.
"""
from __future__ import annotations

import io
import pickle
import struct
import zipfile
from typing import Any, Dict

import numpy as np

_DTYPES = {
    'FloatStorage': (np.float32, 4),
    'DoubleStorage': (np.float64, 8),
    'HalfStorage': (np.float16, 2),
    'BFloat16Storage': ('bfloat16', 2),
    'LongStorage': (np.int64, 8),
    'IntStorage': (np.int32, 4),
    'ShortStorage': (np.int16, 2),
    'CharStorage': (np.int8, 1),
    'ByteStorage': (np.uint8, 1),
    'BoolStorage': (np.bool_, 1),
}


class _StoragePlaceholder:
    def __init__(self, storage_type, key, numel):
        self.storage_type = storage_type
        self.key = key
        self.numel = numel


def _bf16_to_f32(raw: bytes) -> np.ndarray:
    u16 = np.frombuffer(raw, dtype=np.uint16)
    u32 = u16.astype(np.uint32) << 16
    return u32.view(np.float32)


def _rebuild_tensor_v2(storage, storage_offset, size, stride,
                       requires_grad=None, backward_hooks=None,
                       metadata=None):
    return ('tensor', storage, storage_offset, tuple(size), tuple(stride))


class _Unpickler(pickle.Unpickler):
    def __init__(self, f, load_storage):
        super().__init__(f)
        self._load_storage = load_storage

    def find_class(self, module, name):
        if name == '_rebuild_tensor_v2':
            return _rebuild_tensor_v2
        if name == '_rebuild_parameter':
            return lambda data, *a, **k: data
        if name.endswith('Storage'):
            return name                                  # tag only
        if (module, name) == ('collections', 'OrderedDict'):
            import collections
            return collections.OrderedDict
        if module.startswith('torch'):
            # any other torch object: return an inert placeholder factory
            return lambda *a, **k: None
        # Safety allowlist: a pickle can name arbitrary callables, which the
        # default Unpickler would import and invoke (code execution on
        # load). Only benign containers / numpy reconstruction are allowed.
        allowed = {
            ('collections', 'defaultdict'),
            ('builtins', 'dict'), ('builtins', 'list'),
            ('builtins', 'set'), ('builtins', 'frozenset'),
            ('builtins', 'tuple'), ('builtins', 'complex'),
            ('builtins', 'bytearray'),
            ('numpy', 'ndarray'), ('numpy', 'dtype'),
            ('numpy.core.multiarray', '_reconstruct'),
            ('numpy.core.multiarray', 'scalar'),
            ('numpy._core.multiarray', '_reconstruct'),
            ('numpy._core.multiarray', 'scalar'),
        }
        if (module, name) in allowed:
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f'refusing to unpickle {module}.{name}: not in the checkpoint '
            'allowlist (arbitrary classes can execute code on load)')

    def persistent_load(self, pid):
        # ('storage', storage_type_tag, key, location, numel)
        assert pid[0] == 'storage', pid
        _, storage_type, key, _location, numel = pid
        return _StoragePlaceholder(storage_type, key, numel)


def _materialize(obj, storages):
    if isinstance(obj, tuple) and obj and obj[0] == 'tensor':
        _, ph, offset, size, stride = obj
        np_dtype, itemsize = _DTYPES[ph.storage_type]
        raw = storages(ph.key)
        if np_dtype == 'bfloat16':
            flat = _bf16_to_f32(raw)
        else:
            flat = np.frombuffer(raw, dtype=np_dtype)
        if not size:
            if not 0 <= offset < flat.size:
                raise ValueError(
                    f'tensor offset {offset} out of bounds for storage of '
                    f'{flat.size} elements')
            return flat[offset].copy()
        # bounds-check the pickle-controlled view BEFORE as_strided: a
        # crafted size/stride/offset would otherwise read out-of-bounds
        # process memory through the "safe" loader
        max_index = offset + sum(
            (d - 1) * s for d, s in zip(size, stride) if d > 0)
        n_elems = int(np.prod([max(d, 0) for d in size]))
        if (offset < 0 or any(d < 0 for d in size)
                or any(s < 0 for s in stride)
                or (n_elems > 0 and max_index >= flat.size)):
            raise ValueError(
                f'tensor view (offset={offset}, size={tuple(size)}, '
                f'stride={tuple(stride)}) exceeds storage of '
                f'{flat.size} elements')
        arr = np.lib.stride_tricks.as_strided(
            flat[offset:],
            shape=size,
            strides=tuple(s * flat.itemsize for s in stride))
        return np.ascontiguousarray(arr)
    if isinstance(obj, dict):
        return {k: _materialize(v, storages) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        t = type(obj)
        if t is tuple:
            return tuple(_materialize(v, storages) for v in obj)
        return [_materialize(v, storages) for v in obj]
    return obj


def load_pth(path: str) -> Dict[str, Any]:
    """Load a torch .pth (zip format) into nested python/numpy objects.

    Only the modern zip container is supported; legacy
    (`_use_new_zipfile_serialization=False`) pickles need torch itself.
    """
    if not zipfile.is_zipfile(path):
        raise ValueError(
            f'{path} is not a torch zip-format checkpoint; the legacy '
            f'non-zip torch pickle format is not supported by the '
            f'torch-free reader — install torch to load it')
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith('data.pkl'))
        prefix = pkl_name[:-len('data.pkl')]

        cache: Dict[str, bytes] = {}

        def read_storage(key):
            if key not in cache:
                cache[key] = zf.read(f'{prefix}data/{key}')
            return cache[key]

        with zf.open(pkl_name) as f:
            obj = _Unpickler(io.BytesIO(f.read()), read_storage).load()
        return _materialize(obj, read_storage)

"""ctypes binding for the native data-loader core (csrc/loader.cpp).

Falls back to cv2 decoding when the shared library isn't built. Build with:
    make -C csrc
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), 'libvtp_loader.so')
_lib = None


def _load_lib():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.vtp_decode_batch.restype = ctypes.c_int
        lib.vtp_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
        _lib = lib
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


def decode_batch_native(paths: List[str], canvas_size: int,
                        n_threads: int = 8):
    """Decode JPEGs onto zero-filled canvases with the C++ thread pool.

    Returns (canvases [N, S, S, 3] uint8, scales [N] float32). Raises on
    decode failure of any file.
    """
    lib = _load_lib()
    assert lib is not None, 'libvtp_loader.so not built (make -C csrc)'
    n = len(paths)
    canvases = np.empty((n, canvas_size, canvas_size, 3), np.uint8)
    scales = np.empty(n, np.float32)
    widths = np.empty(n, np.int32)
    heights = np.empty(n, np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.vtp_decode_batch(
        c_paths, n,
        canvases.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        canvas_size,
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        heights.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads)
    if rc != 0:
        raise IOError(f'native decode failed for {paths[rc - 1]}')
    return canvases, scales

"""Post-training int8 calibration for the serving path.

The reference deploys through TensorRT, whose int8 mode calibrates static
per-tensor activation ranges offline (the A100 numbers in BASELINE.md are
fp16; int8 is the same idea one step further). The TPU-native equivalent:
run the bf16 model over a few calibration batches, record the absmax of
every MLP matmul input (fc1 input = post-norm2 tokens, fc2 input = GELU
output), and bake those static scales into `ViTConfig.int8_act_scales`.
Static scales matter on TPU: a per-token dynamic amax needs an extra
reduce+dequant pass over the [tokens, hidden] activation that costs more
HBM time than int8 saves (see models/vit.py Int8Dense).
"""
from __future__ import annotations

import dataclasses
import re
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _block_index(path) -> int:
    for part in path:
        m = re.match(r'.*[Bb]lock.*?_(\d+)$', str(part))
        if m:
            return int(m.group(1))
    raise KeyError(f'no block index in {path}')


def calibrate_act_scales(model, variables, batches: Sequence,
                         margin: float = 1.0, attn: bool = False):
    """Measure per-block matmul-input absmax over calibration batches.

    model: TopDownModel (or any module whose backbone has Block_i/norm2 and
    Block_i/mlp/fc1 submodules). Returns a tuple of (fc1_in, fc2_in) pairs
    ordered by block — or, with ``attn=True``, (fc1_in, fc2_in, qkv_in,
    proj_in) quadruples (qkv_in = norm1 output; proj_in sown by
    models/vit.py Attention) — each multiplied by `margin`, ready for
    `int8_serving_config`.
    """
    gelu_approx = bool(getattr(model.cfg.backbone, 'gelu_approx', False))

    capture_names = ('norm2', 'fc1') + (('norm1',) if attn else ())

    def keep(mdl, method_name):
        return method_name == '__call__' and mdl.name in capture_names

    stats: dict = {k: {} for k in ('fc1', 'fc2', 'qkv', 'proj')}

    def bump(kind, idx, val):
        stats[kind][idx] = max(stats[kind].get(idx, 0.0), val)

    for batch in batches:
        _, state = model.apply(variables, jnp.asarray(batch), train=False,
                               capture_intermediates=keep,
                               mutable=['intermediates'])
        flat = jax.tree_util.tree_flatten_with_path(
            state['intermediates'])[0]
        for path, val in flat:
            names = [getattr(p, 'key', str(p)) for p in path]
            interesting = {'norm1', 'norm2', 'fc1', 'proj_in'} & set(names)
            if not interesting:
                continue
            idx = _block_index(names)
            if 'fc1' in names:
                # fc2's input is gelu(fc1 out); gelu's absmax equals the
                # positive max of its input (monotone for x > ~1)
                g = jax.nn.gelu(val, approximate=gelu_approx)
                bump('fc2', idx, float(jnp.max(jnp.abs(g))))
            else:
                amax = float(jnp.max(jnp.abs(val)))
                if 'norm2' in names:
                    bump('fc1', idx, amax)
                elif 'norm1' in names:
                    bump('qkv', idx, amax)
                elif 'proj_in' in names:
                    bump('proj', idx, amax)
    depth = model.cfg.backbone.depth
    kinds = ('fc1', 'fc2') + (('qkv', 'proj') if attn else ())
    missing = [(k, i) for k in kinds for i in range(depth)
               if i not in stats[k]]
    if missing:
        raise RuntimeError(f'calibration captured no stats for '
                           f'{missing}; check module names')
    return tuple(tuple(stats[k][i] * margin for k in kinds)
                 for i in range(depth))


def int8_serving_config(cfg, scales, qkv: bool = False,
                        skip_blocks: Sequence[int] = ()):
    """TopDownConfig -> same config with the int8 serving matmuls enabled.

    ``qkv=True`` additionally runs the attention qkv/proj projections in
    int8 (requires 4-element per-block scales from
    ``calibrate_act_scales(..., attn=True)``). ``skip_blocks`` keeps the
    listed block indices bf16 (selective quantization — the first/last
    blocks dominate the per-instance OKS error; PERF.md int8 selective
    sweep).
    """
    if qkv and any(len(s) < 4 for s in scales):
        raise ValueError('qkv=True needs (fc1, fc2, qkv, proj) scales; '
                         'calibrate with attn=True')
    if getattr(cfg.backbone, 'num_experts', 0) > 0:
        # MoE blocks route to MoEMlp, which has no int8 path — setting the
        # flag would silently serve bf16 while claiming int8
        raise NotImplementedError(
            'int8 serving is not implemented for MoE (num_experts > 0) '
            'backbones: MoEMlp ignores int8_mlp')
    bb = dataclasses.replace(cfg.backbone, int8_mlp=True, int8_qkv=qkv,
                             int8_act_scales=tuple(
                                 tuple(s) for s in scales),
                             int8_skip_blocks=tuple(int(i)
                                                    for i in skip_blocks))
    return dataclasses.replace(cfg, backbone=bb)


def first_last_skip(depth: int, k_first: int, k_last: int):
    """Block-index tuple keeping the first ``k_first`` and last ``k_last``
    blocks bf16 — the selective-quantization shape swept in PERF.md."""
    return tuple(sorted(set(range(k_first))
                        | set(range(depth - k_last, depth))))


def calibrate_from_loader(model, variables, loader, n_batches: int = 2,
                          attn: bool = True, margin: float = 1.0):
    """Calibrate activation scales from an eval loader's first batches.

    Reproduces the val-step preprocessing (canvas uint8 -> UDP/affine
    crop -> imagenet normalize, eval/loop.py make_val_step) on host so
    the calibration sees exactly the distributions the deployed forward
    sees. The deployment workflow behind `tools/test.py --int8` and
    `serve.py --int8`."""
    import itertools
    import jax.numpy as jnp
    from ..data.pipeline import IMAGENET_MEAN, IMAGENET_STD
    from ..ops.geometry import udp_warp_matrix, affine_matrix
    from ..ops.warp import warp_affine_batch

    iw, ih = loader.image_size
    use_udp = bool(getattr(model.cfg, 'use_udp', True))
    batches = []
    for b in itertools.islice(iter(loader), n_batches):
        x = jnp.asarray(b['imgs'], jnp.float32) / 255.0
        center = jnp.asarray(b['center'])
        scale = jnp.asarray(b['scale'])
        zeros = jnp.zeros(center.shape[0])
        if use_udp:
            mat = udp_warp_matrix(zeros, center, scale, (iw, ih))
        else:
            mat = affine_matrix(center, scale, zeros, (iw, ih))
        crops = warp_affine_batch(x, mat, (iw, ih))
        crops = (crops - jnp.asarray(IMAGENET_MEAN)) \
            / jnp.asarray(IMAGENET_STD)
        batches.append(crops)
    return calibrate_act_scales(model, variables, batches, attn=attn,
                                margin=margin)

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
                         margin: float = 1.0):
    """Measure per-block (fc1_in, fc2_in) absmax over calibration batches.

    model: TopDownModel (or any module whose backbone has Block_i/norm2 and
    Block_i/mlp/fc1 submodules). Returns a tuple of (a1, a2) pairs ordered
    by block, each multiplied by `margin`, ready for
    `dataclasses.replace(cfg.backbone, int8_mlp=True,
    int8_act_scales=scales)`.
    """
    gelu_approx = bool(getattr(model.cfg.backbone, 'gelu_approx', False))

    def keep(mdl, method_name):
        return method_name == '__call__' and mdl.name in ('norm2', 'fc1')

    a1: dict = {}
    a2: dict = {}
    for batch in batches:
        _, state = model.apply(variables, jnp.asarray(batch), train=False,
                               capture_intermediates=keep,
                               mutable=['intermediates'])
        flat = jax.tree_util.tree_flatten_with_path(
            state['intermediates'])[0]
        for path, val in flat:
            names = [getattr(p, 'key', str(p)) for p in path]
            if 'norm2' not in names and 'fc1' not in names:
                continue
            idx = _block_index(names)
            amax = float(jnp.max(jnp.abs(val)))
            if 'fc1' in names:
                # fc2's input is gelu(fc1 out); gelu's absmax equals the
                # positive max of its input (monotone for x > ~1)
                g = jax.nn.gelu(val, approximate=gelu_approx)
                amax2 = float(jnp.max(jnp.abs(g)))
                a2[idx] = max(a2.get(idx, 0.0), amax2)
            else:
                a1[idx] = max(a1.get(idx, 0.0), amax)
    depth = model.cfg.backbone.depth
    missing = [i for i in range(depth) if i not in a1 or i not in a2]
    if missing:
        raise RuntimeError(f'calibration captured no stats for blocks '
                           f'{missing}; check module names')
    return tuple((a1[i] * margin, a2[i] * margin) for i in range(depth))


def int8_serving_config(cfg, scales):
    """TopDownConfig -> same config with the int8 serving MLP enabled."""
    bb = dataclasses.replace(cfg.backbone, int8_mlp=True,
                             int8_act_scales=tuple(scales))
    return dataclasses.replace(cfg, backbone=bb)

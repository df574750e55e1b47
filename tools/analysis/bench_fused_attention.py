#!/usr/bin/env python
"""Microbenchmark: fused Pallas attention vs XLA einsum attention for the
ViTPose-B flip-test inference path on one TPU chip."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
import time, jax, jax.numpy as jnp, numpy as np
from vitpose_tpu.models import TopDownModel, make_config, infer
from vitpose_tpu.data import DatasetInfo

B = 64
fi = DatasetInfo.load('coco').flip_index
rng = jax.random.PRNGKey(0)
base = jax.random.normal(rng, (B, 256, 192, 3), jnp.float32)
inputs = [base + i * 1e-6 for i in range(4)]

def sync(o):
    return np.asarray(o[(0,) * (o.ndim - 1)])

def run(fused):
    cfg = make_config('b', img_size=(256, 192), out_channels=17, dtype='bfloat16')
    import dataclasses as dc
    cfg = dc.replace(cfg, backbone=dc.replace(cfg.backbone, fused_attention=fused))
    model = TopDownModel(cfg)
    variables = model.init(rng, base[:1])
    f = jax.jit(lambda v, x: infer(model, v, x, flip_index=fi))
    t0 = time.perf_counter(); sync(f(variables, inputs[0]))
    print(f"fused={fused}: compile {time.perf_counter()-t0:.0f}s", flush=True)
    ts = []
    for i in range(6):
        t0 = time.perf_counter()
        sync(f(variables, inputs[(i+1) % 4]))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"fused={fused}: {t*1e3:.1f} ms/batch -> {B/t:.0f} imgs/s (fliptest)", flush=True)

run(False)
run(True)

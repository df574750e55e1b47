#!/usr/bin/env python
"""Batch-size sweep of the e2e flip-test inference path on one chip."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
import jax, jax.numpy as jnp, numpy as np
import dataclasses as dc
from vitpose_tpu.models import TopDownModel, make_config, infer
from vitpose_tpu.data import DatasetInfo

fi = DatasetInfo.load('coco').flip_index
cfg = make_config('b', img_size=(256, 192), out_channels=17, dtype='bfloat16')
cfg = dc.replace(cfg, backbone=dc.replace(cfg.backbone, fused_attention=True))
model = TopDownModel(cfg)
rng = jax.random.PRNGKey(0)
variables = model.init(rng, jnp.zeros((1, 256, 192, 3)))
f = jax.jit(lambda v, x: infer(model, v, x, flip_index=fi))

def sync(o):
    return np.asarray(o[(0,) * (o.ndim - 1)])

for B in (32, 64, 128, 256):
    inputs = [jax.random.normal(jax.random.PRNGKey(i), (B, 256, 192, 3)) for i in range(3)]
    sync(f(variables, inputs[0]))
    ts = []
    for i in range(5):
        t0 = time.perf_counter(); sync(f(variables, inputs[(i+1)%3])); ts.append(time.perf_counter()-t0)
    t = min(ts)
    print(f"batch {B}: {t*1e3:.1f} ms -> {B/t:.0f} imgs/s", flush=True)

#!/usr/bin/env python
"""Capture a jax.profiler trace of the inference or training step
(TPU-native counterpart of the reference's timing hooks / StopWatch; view
the output with TensorBoard or Perfetto).

Usage:
  python tools/analysis/profile_trace.py CONFIG --out /tmp/trace
      [--mode infer|train] [--batch 64] [--steps 3]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

if os.environ.get('JAX_PLATFORMS'):
    import jax
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('config')
    ap.add_argument('--out', required=True)
    ap.add_argument('--mode', default='infer', choices=['infer', 'train'])
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--steps', type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from vitpose_tpu.utils.config import load_config
    from vitpose_tpu.train.loop import build_model_from_cfg
    from vitpose_tpu.models import infer
    from vitpose_tpu.data import DatasetInfo

    cfg = load_config(args.config)
    model = build_model_from_cfg(cfg['model'])
    ih, iw = model.cfg.backbone.img_size
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, ih, iw, 3)))
    fi = DatasetInfo.load(cfg['data'].get('dataset', 'coco')).flip_index
    x = jax.random.normal(rng, (args.batch, ih, iw, 3))

    if args.mode == 'infer':
        f = jax.jit(lambda v, x: infer(model, v, x, flip_index=fi))
        np.asarray(f(variables, x)[0, 0, 0, 0])       # compile
        with jax.profiler.trace(args.out):
            for _ in range(args.steps):
                out = f(variables, x)
                np.asarray(out[0, 0, 0, 0])
    else:
        from vitpose_tpu.train import (OptimConfig, layer_decay_adamw,
                                       create_train_state, make_train_step)
        k = model.cfg.out_channels
        batch = {'imgs': x,
                 'target': jnp.zeros((args.batch, k, ih // 4, iw // 4)),
                 'target_weight': jnp.ones((args.batch, k))}
        ocfg = OptimConfig(num_layers=model.cfg.backbone.depth)
        tx = layer_decay_adamw(variables['params'], ocfg, 1000)
        state = create_train_state(model, rng, x, tx)
        step = jax.jit(make_train_step(model))
        state, m = step(state, batch, rng)
        float(m['heatmap_loss'])                      # compile
        with jax.profiler.trace(args.out):
            for _ in range(args.steps):
                state, m = step(state, batch, rng)
                float(m['heatmap_loss'])
    print(f'trace written to {args.out}')


if __name__ == '__main__':
    main()

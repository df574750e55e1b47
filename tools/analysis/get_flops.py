#!/usr/bin/env python
"""Model FLOPs/params analysis via XLA cost analysis (counterpart of
reference tools/analysis/get_flops.py which uses forward_dummy + a torch
flops counter).

Usage: python tools/analysis/get_flops.py CONFIG [--shape 256 192]
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
    ap.add_argument('--shape', type=int, nargs=2, default=None,
                    help='input H W (defaults to the config image size)')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vitpose_tpu.utils.config import load_config
    from vitpose_tpu.train.loop import build_model_from_cfg

    cfg = load_config(args.config)
    model = build_model_from_cfg(cfg['model'])
    ih, iw = args.shape or model.cfg.backbone.img_size
    x = jnp.zeros((1, ih, iw, 3))
    variables = model.init(jax.random.PRNGKey(0), x)

    n_params = sum(p.size for p in jax.tree.leaves(variables['params']))
    lowered = jax.jit(lambda v, x: model.apply(v, x, train=False)).lower(
        variables, x)
    cost = lowered.compile().cost_analysis()
    flops = cost.get('flops', float('nan'))
    print(f'input shape : (1, {ih}, {iw}, 3)')
    print(f'params      : {n_params / 1e6:.2f} M')
    print(f'flops (XLA) : {flops / 1e9:.2f} GFLOPs')
    print('note: XLA counts fused/optimized HLO flops; the reference torch '
          'counter reports MACs of the unfused graph.')


if __name__ == '__main__':
    main()

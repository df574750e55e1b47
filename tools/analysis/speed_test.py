#!/usr/bin/env python
"""Raw network-forward speed test (counterpart of reference
tools/analysis/speed_test.py:25-63, which benchmarks the bare forward with
flip_test/post_process disabled and conv+BN fused).

Unlike benchmark_inference.py (full inference incl. decode), this measures
only the jitted backbone+head forward on synthetic batches — the number to
compare against the reference's fuse_conv_bn torch forward. XLA performs
the conv+BN folding automatically at compile time.

Usage: python tools/analysis/speed_test.py CONFIG [--bz 32] [--iters 20]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

if os.environ.get('JAX_PLATFORMS'):
    import jax
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])


def main():
    ap = argparse.ArgumentParser(description='benchmark the bare forward')
    ap.add_argument('config')
    ap.add_argument('--bz', type=int, default=32)
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--warmup', type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vitpose_tpu.utils.config import load_config
    from vitpose_tpu.train.loop import build_model_from_cfg

    cfg = load_config(args.config)
    # forward speed only: no pretrained load, no flip test, no decode
    cfg['model'].pop('pretrained', None)
    model = build_model_from_cfg(cfg['model'])
    try:
        ih, iw = model.cfg.backbone.img_size
    except AttributeError:
        ih, iw = (256, 192)

    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, ih, iw, 3)))

    @jax.jit
    def fwd(v, x):
        out = model.apply(v, x, train=False)
        out = out[-1] if isinstance(out, (list, tuple)) else out
        return jnp.sum(out)  # scalar readback = sync point

    xs = [jax.random.normal(jax.random.PRNGKey(i), (args.bz, ih, iw, 3))
          for i in range(4)]
    for i in range(args.warmup):
        float(fwd(variables, xs[i % len(xs)]))
    t0 = time.perf_counter()
    for i in range(args.iters):
        float(fwd(variables, xs[i % len(xs)]))
    dt = time.perf_counter() - t0
    fps = args.bz * args.iters / dt
    print(f'batch={args.bz} iters={args.iters} '
          f'time={dt:.3f}s -> {fps:.1f} img/s (bare forward)')


if __name__ == '__main__':
    main()

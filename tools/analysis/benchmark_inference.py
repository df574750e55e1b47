#!/usr/bin/env python
"""Inference FPS benchmark (counterpart of reference
tools/analysis/benchmark_inference.py).

Usage: python tools/analysis/benchmark_inference.py CONFIG
           [--batch 64] [--iters 10] [--no-flip]
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
    ap = argparse.ArgumentParser()
    ap.add_argument('config')
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--iters', type=int, default=10)
    ap.add_argument('--no-flip', action='store_true')
    ap.add_argument('--group', type=int, default=1,
                    help='batches scanned per dispatch (amortizes launch '
                         'latency; the serving-loop regime)')
    ap.add_argument('--fast', action='store_true',
                    help='bf16 + Pallas attention + tanh GELU')
    ap.add_argument('--int8', action='store_true',
                    help='W8A8 MLP with calibrated static scales')
    ap.add_argument('--int8-qkv', action='store_true',
                    help='also quantize attention qkv/proj (implies --int8)')
    ap.add_argument('--latency', action='store_true',
                    help='per-dispatch latency percentiles at small batches '
                         '(serving-latency regime; group is ignored)')
    args = ap.parse_args()
    args.int8 = args.int8 or args.int8_qkv

    import jax
    import jax.numpy as jnp
    import numpy as np
    from vitpose_tpu.utils.config import load_config
    from vitpose_tpu.train.loop import build_model_from_cfg
    from vitpose_tpu.models import infer
    from vitpose_tpu.data import DatasetInfo

    cfg = load_config(args.config)
    model = build_model_from_cfg(cfg['model'])
    if args.fast or args.int8:
        import dataclasses as dc
        mc = dc.replace(model.cfg, backbone=dc.replace(
            model.cfg.backbone, dtype='bfloat16', fused_attention=True,
            gelu_approx=True))
        model = type(model)(mc)
    ih, iw = model.cfg.backbone.img_size
    b = args.batch
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, ih, iw, 3)))
    if args.int8:
        from vitpose_tpu.utils.quantize import (calibrate_act_scales,
                                                int8_serving_config)
        cal = [jax.random.normal(jax.random.PRNGKey(i), (8, ih, iw, 3))
               for i in range(2)]
        scales = calibrate_act_scales(model, variables, cal,
                                      attn=args.int8_qkv)
        model = type(model)(int8_serving_config(model.cfg, scales,
                                                qkv=args.int8_qkv))
    fi = None if args.no_flip else DatasetInfo.load(
        cfg['data'].get('dataset', 'coco')).flip_index

    def sync(o):
        return np.asarray(o[(0,) * (o.ndim - 1)])

    if args.latency:
        # one dispatch per request, small batches: what an online server
        # pays per call. On this sandbox each dispatch carries ~27ms of
        # remote-tunnel overhead (PERF.md platform characterization);
        # locally-attached TPUs pay microseconds, so read the deltas
        # between batch sizes, not the absolute floor.
        f1 = jax.jit(lambda v, x: infer(model, v, x, flip_index=fi))
        for lb in (1, 8, 32):
            xs = [jax.random.normal(jax.random.PRNGKey(i), (lb, ih, iw, 3))
                  for i in range(8)]
            sync(f1(variables, xs[0]))          # compile
            ts = []
            for i in range(max(16, args.iters)):
                x = xs[i % len(xs)]
                t0 = time.perf_counter()
                sync(f1(variables, x))
                ts.append((time.perf_counter() - t0) * 1e3)
            ts.sort()
            p50 = ts[len(ts) // 2]
            p99 = ts[min(len(ts) - 1, int(len(ts) * 0.99))]
            print(f'batch {lb:3d}: p50 {p50:7.1f} ms  p99 {p99:7.1f} ms '
                  f'per dispatch '
                  f'({"flip test" if fi is not None else "single forward"})')
        return

    g = max(1, args.group)
    if g == 1:
        f = jax.jit(lambda v, x: infer(model, v, x, flip_index=fi))
    else:
        # scan G batches inside one dispatch (the bench.py serving-loop
        # shape): amortizes the per-dispatch launch/tunnel latency, the
        # steady-state serving regime
        def f_inner(v, xs):
            def body(c, x):
                return c, infer(model, v, x, flip_index=fi)
            _, outs = jax.lax.scan(body, 0, xs)
            return outs
        f = jax.jit(f_inner)
    shape = (b, ih, iw, 3) if g == 1 else (g, b, ih, iw, 3)
    inputs = [jax.random.normal(jax.random.PRNGKey(i), shape)
              for i in range(4)]

    t0 = time.perf_counter()
    sync(f(variables, inputs[0]))
    print(f'compiled in {time.perf_counter() - t0:.1f}s')
    ts = []
    for i in range(args.iters):
        x = inputs[(i + 1) % len(inputs)]
        t0 = time.perf_counter()
        sync(f(variables, x))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    n_img = b * g
    print(f'batch {b} x group {g}: {t * 1e3:.1f} ms -> '
          f'{n_img / t:.1f} imgs/s '
          f'({"flip test" if fi is not None else "single forward"})')


if __name__ == '__main__':
    main()

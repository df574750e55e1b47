#!/usr/bin/env python
"""Model-zoo serving throughput sweep on one chip.

Measures the deployed single-forward path (uint8-equivalent f32 input,
bf16 + fused Pallas attention + tanh GELU for ViT; bf16 for the CNN
families) across the flagship variants and representative CNN configs,
the way bench.py measures ViTPose-B — GROUP batches scanned per dispatch
(steady-state serving regime), distinct inputs per iteration, host
readback as the sync point.

Counterpart of the reference's per-model speed tables (README.md
throughput figure covers ViTPose-B only; this extends the measurement to
the zoo). Emits one JSON line per model plus a markdown table.

Usage: python tools/analysis/bench_zoo.py [--iters 3] [--only vitpose_s,...]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

if os.environ.get('JAX_PLATFORMS'):
    import jax
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

CFG_DIR = os.path.join(os.path.dirname(__file__), '..', '..',
                       'vitpose_tpu', 'configs')

# name -> (config, batch, group): batch*group sized to keep each dispatch
# ~0.5-2s so the tunnel overhead (~27ms) stays <5% without blowing HBM on
# the larger variants.
ZOO = {
    'vitpose_s': ('coco/vitpose_s_coco_256x192.py', 256, 16),
    'vitpose_b': ('coco/vitpose_b_coco_256x192.py', 256, 16),
    'vitpose_l': ('coco/vitpose_l_coco_256x192.py', 256, 8),
    'vitpose_h': ('coco/vitpose_h_coco_256x192.py', 128, 8),
    'hrnet_w32': ('coco/hrnet_w32_coco_256x192.py', 256, 8),
    'hrnet_w48': ('coco/hrnet_w48_coco_256x192.py', 128, 8),
    'res50': ('coco/res50_coco_256x192.py', 256, 8),
    'litehrnet_18': ('coco/litehrnet_18_coco_256x192.py', 256, 8),
    'mobilenetv2': ('coco/mobilenetv2_coco_256x192.py', 256, 8),
    'hrformer_small': ('coco/hrformer_small_coco_256x192.py', 128, 8),
}


def build_fast(path):
    from vitpose_tpu.utils.config import load_config
    from vitpose_tpu.train.loop import build_model_from_cfg
    cfg = load_config(os.path.join(CFG_DIR, path))
    mcfg = dict(cfg['model'])
    mcfg['dtype'] = 'bfloat16'
    over = dict(mcfg.get('backbone_overrides', {}))
    if mcfg.get('backbone_type', 'vit') == 'vit':
        over.update(fused_attention=True, gelu_approx=True)
    else:
        over['dtype'] = 'bfloat16'
    mcfg['backbone_overrides'] = over
    try:
        return build_model_from_cfg(mcfg)
    except TypeError:
        # backbone config without a dtype knob: measure in f32
        over.pop('dtype', None)
        mcfg['backbone_overrides'] = over
        return build_model_from_cfg(mcfg)


def measure(model, batch, group, iters):
    import jax
    import jax.numpy as jnp
    import numpy as np
    ih, iw = model.cfg.backbone.img_size
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, ih, iw, 3)))

    def fwd(v, xs):
        def body(c, x):
            hm = model.apply(v, x, train=False)
            if isinstance(hm, (list, tuple)):
                hm = hm[-1]
            return c, jnp.max(hm, axis=(1, 2))
        _, outs = jax.lax.scan(body, 0, xs)
        return outs

    f = jax.jit(fwd)
    inputs = [jax.random.normal(jax.random.PRNGKey(i),
                                (group, batch, ih, iw, 3),
                                dtype=jnp.bfloat16).astype(jnp.float32)
              for i in range(3)]
    flops = None
    try:
        ca = f.lower(variables, inputs[0]).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get('flops', 0.0)) / (group * batch) or None
    except Exception:
        pass

    def sync(o):
        return np.asarray(o[0, 0, 0])

    sync(f(variables, inputs[0]))          # compile + warm
    ts = []
    for i in range(iters):
        x = inputs[(i + 1) % len(inputs)]
        t0 = time.perf_counter()
        sync(f(variables, x))
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2]
    return group * batch / dt, flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=3)
    ap.add_argument('--only', type=str, default='')
    args = ap.parse_args()
    names = [n for n in args.only.split(',') if n] or list(ZOO)

    rows = []
    for name in names:
        path, batch, group = ZOO[name]
        model = build_fast(path)
        t0 = time.perf_counter()
        imgs_s, flops = measure(model, batch, group, args.iters)
        rec = {'model': name, 'imgs_per_sec': round(imgs_s, 1),
               'batch': batch, 'group': group,
               'gflops_per_img': round(flops / 1e9, 2) if flops else None,
               'tflops_per_sec': (round(imgs_s * flops / 1e12, 1)
                                  if flops else None)}
        print(json.dumps(rec), flush=True)
        rows.append(rec)
        del model

    # XLA-counted flops are fusion-dependent (see get_flops.py note);
    # imgs/s is the metric, the flop columns are context only.
    print('\n| model | batch | imgs/s/chip | GFLOP/img (XLA) | TFLOP/s |')
    print('|---|---|---|---|---|')
    for r in rows:
        print(f"| {r['model']} | {r['batch']}x{r['group']} | "
              f"{r['imgs_per_sec']} | {r['gflops_per_img'] or '-'} | "
              f"{r['tflops_per_sec'] or '-'} |")


if __name__ == '__main__':
    main()

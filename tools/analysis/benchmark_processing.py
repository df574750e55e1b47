#!/usr/bin/env python
"""Data-pipeline throughput benchmark (counterpart of reference
tools/analysis/benchmark_processing.py, which times the cv2 transform
pipeline): measures the host loader (jpeg decode + canvas placement +
augmentation sampling) and the device preprocess (batched warp +
normalize + target generation) separately.

Usage: python tools/analysis/benchmark_processing.py [--ann ANN]
           [--prefix DIR] [--batch 64] [--iters 20]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

REF = '/root/reference/tests/data/coco'


def main():
    # CLI-only platform override (import-time application would leak the
    # env platform into library importers; see tools/model_split.py)
    if os.environ.get('JAX_PLATFORMS'):
        import jax
        jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
    ap = argparse.ArgumentParser()
    ap.add_argument('--ann', default=f'{REF}/test_coco.json')
    ap.add_argument('--prefix', default=REF + '/')
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--num-workers', type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from vitpose_tpu.data import TopDownDataset
    from vitpose_tpu.data.loader import TopDownLoader
    from vitpose_tpu.data.pipeline import make_preprocess_fn

    ds = TopDownDataset(args.ann, args.prefix, dataset_info='coco')
    loader = TopDownLoader(ds, args.batch, is_train=True,
                           num_workers=args.num_workers, seed=0)
    pre = make_preprocess_fn(image_size=(192, 256), heatmap_size=(48, 64),
                             use_udp=True, sigma=2.0)
    pre_j = pre           # already jitted

    # stream host timing; keep only a bounded sample for the device pass
    # (holding iters x dataset of uint8 canvases would OOM on real data)
    host_batches = []
    t0 = time.perf_counter()
    n_img = 0
    for it in range(args.iters):
        loader.set_epoch(it)
        for batch in loader:
            if len(host_batches) < 16:
                host_batches.append(batch)
            n_img += len(batch['imgs'])
    host_dt = time.perf_counter() - t0
    print(f'host loader: {n_img / host_dt:.1f} imgs/s '
          f'({args.num_workers} workers, jpeg decode + canvas + aug)')

    def args_of(batch):
        return (jnp.asarray(batch['imgs']), jnp.asarray(batch['center']),
                jnp.asarray(batch['scale']), jnp.asarray(batch['rot']),
                jnp.asarray(batch['joints']), jnp.asarray(batch['vis']))

    out = pre_j(*args_of(host_batches[0]))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 0
    for batch in host_batches:
        out = pre_j(*args_of(batch))
        reps += len(batch['imgs'])
    jax.block_until_ready(out)
    dev_dt = time.perf_counter() - t0
    print(f'device preprocess (warp+normalize+targets, one jit): '
          f'{reps / dev_dt:.1f} imgs/s')


if __name__ == '__main__':
    main()

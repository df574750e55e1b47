#!/usr/bin/env python
"""Input-pipeline throughput: JPEG decode + canvas assembly rate.

The serving/bench numbers (bench.py) measure the on-device path; this
tool proves the host input pipeline can keep that device fed. It
measures:

  1. native C++ thread-pool JPEG decode onto fixed canvases
     (csrc/loader.cpp via data/native.py), thread sweep;
  2. the cv2 fallback (single process) for comparison;
  3. the full TopDownLoader batch assembly rate (decode + record prep +
     collation) on a synthetic COCO-sized image set.

Counterpart of reference tools/analysis/benchmark_processing.py (data
processing side of the pipeline).

Usage: python tools/analysis/bench_io.py [--n 256] [--batch 64]
"""
import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))


def make_jpegs(tmpdir, n, w=640, h=480, quality=90):
    import cv2
    import numpy as np
    rng = np.random.default_rng(0)
    paths = []
    # realistic JPEG entropy: smooth random fields, not white noise
    for i in range(n):
        small = rng.integers(0, 255, (h // 8, w // 8, 3), dtype=np.uint8)
        img = cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
        p = os.path.join(tmpdir, f'{i:05d}.jpg')
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, quality])
        paths.append(p)
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=256)
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--canvas', type=int, default=640)
    ap.add_argument('--iters', type=int, default=3)
    args = ap.parse_args()

    from vitpose_tpu.data.native import native_available, decode_batch_native

    with tempfile.TemporaryDirectory() as tmpdir:
        paths = make_jpegs(tmpdir, args.n)
        sz = sum(os.path.getsize(p) for p in paths) / len(paths)
        print(f'{args.n} JPEGs, 640x480, avg {sz / 1024:.0f} KiB')

        if native_available():
            for threads in (1, 4, 8, 16):
                ts = []
                for _ in range(args.iters):
                    t0 = time.perf_counter()
                    decode_batch_native(paths, args.canvas,
                                        n_threads=threads)
                    ts.append(time.perf_counter() - t0)
                dt = min(ts)
                print(f'native decode, {threads:2d} threads: '
                      f'{args.n / dt:8.1f} imgs/s')
        else:
            print('native loader not built (make -C csrc)')

        import cv2
        cv2.setNumThreads(0)
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            for p in paths:
                cv2.imread(p)
            ts.append(time.perf_counter() - t0)
        print(f'cv2.imread single-thread : {args.n / min(ts):8.1f} imgs/s')

        # full loader: synthetic COCO-style dataset over these files
        import numpy as np
        from vitpose_tpu.data import DatasetInfo
        from vitpose_tpu.data.loader import TopDownLoader
        recs = []
        for i, p in enumerate(paths):
            recs.append(dict(
                image_file=p,
                bbox=np.asarray([200.0, 120.0, 240.0, 320.0], np.float32),
                rotation=0,
                joints_3d=np.tile(np.asarray([[300.0, 200.0, 0.0]],
                                             np.float32), (17, 1)),
                joints_3d_visible=np.tile(
                    np.asarray([[1.0, 1.0, 0.0]], np.float32), (17, 1)),
                bbox_score=1.0, bbox_id=i, image_id=i, dataset_idx=0))

        class _DS:
            db = recs
            num_joints = 17
            image_size = (256, 192)
            heatmap_size = (64, 48)
            info = DatasetInfo.load('coco')
            dataset_idx = 0
            name = 'synthetic'

        for train in (True, False):
            loader = TopDownLoader(_DS(), args.batch, is_train=train,
                                   canvas_size=args.canvas, seed=0)
            n_img = 0
            t0 = time.perf_counter()
            for b in loader:
                n_img += int(b['imgs'].shape[0])
            dt = time.perf_counter() - t0
            mode = 'train' if train else 'eval '
            print(f'TopDownLoader {mode} batches : {n_img / dt:8.1f} imgs/s'
                  f' (decode+prep+collate, single process)')


if __name__ == '__main__':
    main()

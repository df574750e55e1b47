"""Batched data loading for TPU training/eval.

Replaces the reference torch DataLoader + per-sample CPU pipeline
(reference: mmpose/datasets/builder.py:90 `build_dataloader`,
samplers/distributed_sampler.py:6) with:

  * host worker threads that decode JPEGs and paste them onto ONE static
    uint8 canvas [S, S, 3] (COCO images are <=640px; larger sources are
    pre-scaled and their center/scale adjusted),
  * numpy batch assembly with deterministic epoch+seed shuffling and
    per-process sharding (multi-host: each process takes
    records[process_index::process_count], the jax.process_index analog of
    the reference's per-rank DistributedSampler),
  * device-side crop/normalize/target-gen via
    vitpose_tpu.data.pipeline.make_preprocess_fn (one jit per batch).

Static shapes everywhere: the final incomplete batch is padded and carries
a `valid` mask (the reference just runs a ragged final batch on GPU —
rebatching would recompile on TPU).
"""
from __future__ import annotations

import concurrent.futures as futures
import os
from typing import Iterator, Optional

import numpy as np

from .dataset_info import DatasetInfo
from .pipeline import AugmentConfig, sample_augmentations
from ..ops.geometry import bbox_xywh2cs


def _load_canvas(path, canvas_size):
    """Decode an image onto a static canvas; returns (canvas,
    scale_factor). Images larger than the canvas are uniformly
    downscaled."""
    import cv2
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    h, w = img.shape[:2]
    s = min(1.0, canvas_size / max(h, w))
    if s < 1.0:
        img = cv2.resize(img, (int(round(w * s)), int(round(h * s))),
                         interpolation=cv2.INTER_LINEAR)
        h, w = img.shape[:2]
    canvas = np.zeros((canvas_size, canvas_size, 3), np.uint8)
    canvas[:h, :w] = img
    return canvas, np.float32(s)


class TopDownLoader:
    """Iterate (host_batch dicts) over a TopDownDataset.

    host_batch keys: imgs [N,S,S,3] uint8, center, scale, rot, joints, vis,
    bbox_score, bbox_id, image_path (list), valid [N] bool,
    dataset_idx [N] int32.
    """

    def __init__(self, dataset, batch_size, is_train=True, canvas_size=None,
                 padding=1.25, aug: Optional[AugmentConfig] = None,
                 seed=0, num_workers=8, process_index=0, process_count=1,
                 drop_last=None):
        self.ds = dataset
        self.batch_size = batch_size
        self.is_train = is_train
        # canvas is dataset-driven by default: COCO sources are <=640px, but
        # MPII/PoseTrack/AIC frames are larger and would be double-resampled
        # (canvas downscale + crop warp) on a 640 canvas
        self.canvas_size = (canvas_size if canvas_size is not None
                            else getattr(dataset, 'canvas_size', 640))
        self.padding = padding
        self.aug = aug or AugmentConfig()
        self.seed = seed
        # JPEG decode releases the GIL (libjpeg / cv2), so decode threads
        # overlap even when os.cpu_count() underreports (cgroup sandboxes:
        # measured 3.3x at 4 threads with nproc=1, tools/analysis/bench_io.py)
        self.num_workers = max(1, min(num_workers, 16))
        from .native import native_available
        self.use_native = native_available()
        self.process_index = process_index
        self.process_count = process_count
        self.drop_last = is_train if drop_last is None else drop_last
        self.epoch = 0
        self.image_size = tuple(dataset.image_size)
        self._pool = None

    def _shard_len(self):
        # every shard padded to the same (ceil) size, like the reference
        # DistributedSampler (samplers/distributed_sampler.py:25-41) — a
        # floor here would silently drop the tail records of the larger
        # shards from evaluation
        return -(-len(self.ds.db) // self.process_count)

    def __len__(self):
        per = self._shard_len()
        if self.drop_last:
            return per // self.batch_size
        return (per + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch):
        self.epoch = epoch

    def _indices(self):
        n = len(self.ds.db)
        idx = np.arange(n)
        if self.is_train:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        if self.process_count > 1:
            total = self._shard_len() * self.process_count
            if total > n:
                # wrap-around padding to divisibility; np.resize tiles the
                # index array, so even total > 2n (more processes than
                # records) leaves no shard empty
                idx = np.resize(idx, total)
            idx = idx[self.process_index::self.process_count]
        return idx

    def _decode_chunk(self, recs):
        """Decode a chunk of records' images -> (canvases, scale_factors).
        Uses the native C++ pool when built; else threaded cv2."""
        paths = [r['image_file'] for r in recs]
        if self.use_native and all(p.lower().endswith(('.jpg', '.jpeg'))
                                   for p in paths):
            from .native import decode_batch_native
            return decode_batch_native(paths, self.canvas_size,
                                       self.num_workers)
        canvases = np.empty((len(paths), self.canvas_size,
                             self.canvas_size, 3), np.uint8)
        sfacs = np.empty(len(paths), np.float32)
        if self.num_workers > 1:
            if self._pool is None:      # one pool for the loader lifetime
                self._pool = futures.ThreadPoolExecutor(self.num_workers)
            outs = list(self._pool.map(
                lambda p: _load_canvas(p, self.canvas_size), paths))
        else:
            outs = [_load_canvas(p, self.canvas_size) for p in paths]
        for j, (c, s) in enumerate(outs):
            canvases[j] = c
            sfacs[j] = s
        return canvases, sfacs

    def _prepare_record(self, i, rec_rng, canvas, sfac):
        rec = self.ds.db[i]
        k = self.ds.num_joints
        if 'center' in rec and 'scale' in rec:
            # records that carry center/scale directly (e.g. MPII)
            center = np.asarray(rec['center'], np.float32) * sfac
            scale = np.asarray(rec['scale'], np.float32) * sfac
        else:
            bbox = rec['bbox'] * sfac
            aspect = self.image_size[0] / self.image_size[1]
            center, scale = bbox_xywh2cs(bbox, aspect, padding=self.padding)
            center = np.asarray(center, np.float32)
            scale = np.asarray(scale, np.float32)
            if self.is_train and rec_rng.rand() < 0.3:
                # reference _xywh2cs train-time center jitter
                # (kpt_2d_sview_rgb_img_top_down_dataset.py:147-148)
                center = center + (0.4 * (rec_rng.rand(2) - 0.5)
                                   * bbox[2:4]).astype(np.float32)
        joints = rec['joints_3d'][:, :2] * sfac
        vis = rec['joints_3d_visible'][:, 0]

        flipped = False
        if self.is_train and self.aug.has_image_augs():
            # image-level augs (photometric / dropout / albumentations)
            # mutate this record's canvas row in place; the on-device crop
            # then samples the augmented pixels (reference applies these
            # after TopDownAffine — pixel-wise ops commute with the warp)
            from .pipeline import apply_image_augmentations
            canvas[...] = apply_image_augmentations(rec_rng, canvas,
                                                    self.aug)
        if self.is_train:
            r = dict(rec, center=center, scale=scale,
                     joints_3d=np.concatenate(
                         [joints, rec['joints_3d'][:, 2:]], axis=1),
                     joints_3d_visible=rec['joints_3d_visible'])
            center, scale, rot, joints, vis, flipped = sample_augmentations(
                rec_rng, r, self.ds.info, self.canvas_size, self.aug,
                self.image_size)
        else:
            rot = np.float32(0.0)

        return dict(img=canvas, center=center, scale=scale, rot=rot,
                    flip=bool(flipped),
                    joints=joints.astype(np.float32),
                    vis=vis.astype(np.float32),
                    bbox_score=np.float32(rec['bbox_score']),
                    bbox_id=rec['bbox_id'],
                    dataset_idx=np.int32(rec.get('dataset_idx', 0)),
                    scale_factor=sfac,
                    image_path=rec['image_file'])

    def __iter__(self) -> Iterator[dict]:
        idx = self._indices()
        bs = self.batch_size
        rng = np.random.RandomState(self.seed * 1000 + self.epoch)
        n_batches = len(self)
        for b in range(n_batches):
            chunk = idx[b * bs:(b + 1) * bs]
            valid = np.zeros(bs, bool)
            valid[:len(chunk)] = True
            # deterministic per-record rngs
            seeds = rng.randint(0, 2 ** 31, size=len(chunk))
            canvases, sfacs = self._decode_chunk(
                [self.ds.db[i] for i in chunk])
            recs = [self._prepare_record(i, np.random.RandomState(s),
                                         canvases[j], sfacs[j])
                    for j, (i, s) in enumerate(zip(chunk, seeds))]
            while len(recs) < bs:          # pad final batch
                recs.append(recs[-1])
            # canvases pass through unmodified (pixel flip/warp happens on
            # device), so reuse the decode buffer instead of re-stacking
            # ~80MB of views per batch
            if len(chunk) == bs:
                imgs = canvases
            else:
                pad = np.broadcast_to(canvases[-1:],
                                      (bs - len(chunk),) + canvases.shape[1:])
                imgs = np.concatenate([canvases, pad])
            batch = dict(
                imgs=imgs,
                center=np.stack([r['center'] for r in recs]),
                scale=np.stack([r['scale'] for r in recs]),
                rot=np.stack([r['rot'] for r in recs]),
                flip=np.array([r['flip'] for r in recs], bool),
                joints=np.stack([r['joints'] for r in recs]),
                vis=np.stack([r['vis'] for r in recs]),
                bbox_score=np.stack([r['bbox_score'] for r in recs]),
                bbox_id=np.array([r['bbox_id'] for r in recs]),
                dataset_idx=np.array([r['dataset_idx'] for r in recs],
                                     np.int32),
                scale_factor=np.stack([r['scale_factor'] for r in recs]),
                valid=valid,
                image_paths=[r['image_path'] for r in recs],
            )
            # center/scale for decode must be in ORIGINAL image coords
            batch['center_orig'] = (batch['center']
                                    / batch['scale_factor'][:, None])
            batch['scale_orig'] = (batch['scale']
                                   / batch['scale_factor'][:, None])
            yield batch


class MultiDatasetLoader:
    """ViTPose+ multi-dataset mixture: concatenates datasets (each with its
    own dataset_idx) and samples uniformly over the union, like the
    reference's ConcatDataset training (datasets/builder.py:75-79)."""

    def __init__(self, loaders, seed=0):
        self.loaders = loaders
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch):
        """Re-seed the interleave order per epoch (child loaders get their
        own set_epoch from the train loop); a fixed order would bias the
        tail-of-epoch gradient toward one dataset for the whole run."""
        self.epoch = int(epoch)

    def __len__(self):
        return sum(len(l) for l in self.loaders)

    def __iter__(self):
        iters = [iter(l) for l in self.loaders]
        counts = [len(l) for l in self.loaders]
        order = np.concatenate([np.full(c, i) for i, c in enumerate(counts)])
        np.random.RandomState(self.seed * 9973 + self.epoch).shuffle(order)
        for i in order:
            try:
                yield next(iters[i])
            except StopIteration:
                continue


class RepeatDataset:
    """Repeat a dataset `times` times per epoch (reference
    dataset_wrappers.py:6 RepeatDataset): the record db is tiled, so the
    loader's deterministic shuffling sees `times` copies."""

    def __init__(self, dataset, times):
        self._ds = dataset
        self.times = times
        self.db = list(dataset.db) * times

    def __getattr__(self, name):
        return getattr(self._ds, name)

    def __len__(self):
        return len(self.db)


class ConcatPoseDataset:
    """Concatenate same-format datasets (reference builder.py:29
    `_concat_dataset` for ann_file lists): records are merged; metadata
    comes from the first dataset."""

    def __init__(self, datasets):
        assert datasets
        self._ds = datasets[0]
        self.datasets = list(datasets)
        self.db = [r for d in datasets for r in d.db]

    def __getattr__(self, name):
        return getattr(self._ds, name)

    def __len__(self):
        return len(self.db)

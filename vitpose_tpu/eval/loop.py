"""Validation loop: sharded inference over a dataset -> COCO stats.

Replaces the reference's `single_gpu_test` / `multi_gpu_test` +
`collect_results_gpu` pickle-gather (reference: mmpose/apis/test.py:15,50,
119,179). TPU-native design: batches stay fixed-shape, heatmap decode runs
inside the same jit as the forward, and per-process results are plain numpy
on host (multi-host gather is host-side concatenation, which matches the
reference's collect_results_cpu semantics without the tmpdir/pickle dance).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..models.topdown import infer
from ..ops.decode import keypoints_from_heatmaps
from ..data.pipeline import IMAGENET_MEAN, IMAGENET_STD


def make_val_step(model, image_size, use_udp=True, post_process='default',
                  modulate_kernel=11, flip_index=None,
                  target_type='GaussianHeatmap', head_idx=None):
    """Build the jitted val step: canvas uint8 batch -> decoded keypoints.

    `head_idx` selects an associate head for ViTPose+ multi-dataset eval
    (0/None = main head). Returns (val_step, val_step_grouped): the grouped
    variant scans a [G, ...] stack of batches in ONE dispatch, amortizing
    the per-dispatch launch latency (~27 ms on the sandbox tunnel) the way
    the serving loop does."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from ..ops.geometry import udp_warp_matrix, affine_matrix
    from ..ops.warp import warp_affine_batch

    iw, ih = image_size

    def val_step_fn(variables, imgs, center, scale, center_orig, scale_orig,
                    expert_idx=None):
        # `center`/`scale` are CANVAS coords (the loader may downscale large
        # sources onto the fixed canvas) and drive the crop warp;
        # `center_orig`/`scale_orig` are ORIGINAL-image coords and drive the
        # decode, so predictions land in original-image space.
        x = imgs.astype(jnp.float32) / 255.0
        zeros = jnp.zeros(center.shape[0])
        if use_udp:
            mat = udp_warp_matrix(zeros, center, scale, (iw, ih))
        else:
            mat = affine_matrix(center, scale, zeros, (iw, ih))
        crops = warp_affine_batch(x, mat, (iw, ih))
        crops = (crops - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(
            IMAGENET_STD)
        hm = infer(model, variables, crops, flip_index=flip_index,
                   expert_idx=expert_idx, head_idx=head_idx)
        if target_type.lower() == 'regression':
            # DeepPose decode: normalized coords * img_size -> image space
            # (reference keypoints_from_regression, top_down_eval.py:441)
            from ..ops.geometry import transform_preds
            px = hm * jnp.asarray([iw, ih], jnp.float32)
            preds = transform_preds(px, center_orig, scale_orig, (iw, ih),
                                    use_udp=use_udp)
            return preds, jnp.ones(hm.shape[:2] + (1,), jnp.float32)
        preds, maxvals = keypoints_from_heatmaps(
            hm, center_orig, scale_orig, post_process=post_process,
            kernel=modulate_kernel, use_udp=use_udp, target_type=target_type)
        return preds, maxvals

    val_step = jax.jit(val_step_fn)

    @jax.jit
    def val_step_grouped(variables, imgs, center, scale, center_orig,
                         scale_orig, expert_idx=None):
        """All args carry a leading group dim [G, ...]; one lax.scan."""
        def body(carry, args):
            if expert_idx is None:
                im, c, s, co, so = args
                out = val_step_fn(variables, im, c, s, co, so)
            else:
                im, c, s, co, so, ei = args
                out = val_step_fn(variables, im, c, s, co, so, ei)
            return carry, out
        xs = (imgs, center, scale, center_orig, scale_orig)
        if expert_idx is not None:
            xs = xs + (expert_idx,)
        _, outs = jax.lax.scan(body, 0, xs)
        return outs

    return val_step, val_step_grouped


# bounded: each entry pins a model object + its compiled executables, so an
# unbounded id-keyed dict leaks across checkpoint/config sweeps
_VAL_CACHE_MAX = 4
_val_step_cache = {}


def _val_cache_put(key, value):
    if key not in _val_step_cache and \
            len(_val_step_cache) >= _VAL_CACHE_MAX:
        _val_step_cache.pop(next(iter(_val_step_cache)))
    _val_step_cache[key] = value
    return value


def run_validation(model, variables, loader, use_udp=True,
                   post_process='default', modulate_kernel=11,
                   expert_idx: Optional[int] = None, progress=False,
                   target_type='GaussianHeatmap', head_idx=None,
                   group_size: int = 4):
    """Run the val loop and return the results list consumed by
    TopDownDataset.evaluate (preds/boxes/image_paths/bbox_ids per batch).

    Batches are stacked `group_size` at a time and scanned in ONE device
    dispatch (amortizes launch/tunnel latency); the remainder runs through
    the single-batch step. The jitted steps are cached per (model,
    geometry, decode config) so periodic in-training evaluation doesn't
    recompile every time."""
    import jax.numpy as jnp

    flip_index = loader.ds.info.flip_index
    key = (id(model), tuple(loader.image_size), use_udp, post_process,
           modulate_kernel, target_type, head_idx,
           tuple(flip_index.tolist()))
    if key not in _val_step_cache:
        _val_cache_put(key, make_val_step(
            model, loader.image_size, use_udp=use_udp,
            post_process=post_process, modulate_kernel=modulate_kernel,
            flip_index=flip_index, target_type=target_type,
            head_idx=head_idx))
    val_step, val_step_grouped = _val_step_cache[key]

    def decode_group(batches):
        n = batches[0]['imgs'].shape[0]
        eidx = (np.full((len(batches), n), expert_idx, np.int32)
                if expert_idx is not None else None)

        def stack(key_):
            return jnp.asarray(np.stack([b[key_] for b in batches]))

        if len(batches) == 1:
            b = batches[0]
            preds, maxvals = val_step(
                variables, jnp.asarray(b['imgs']), jnp.asarray(b['center']),
                jnp.asarray(b['scale']), jnp.asarray(b['center_orig']),
                jnp.asarray(b['scale_orig']),
                jnp.asarray(eidx[0]) if eidx is not None else None)
            preds, maxvals = np.asarray(preds)[None], np.asarray(maxvals)[None]
        else:
            # warp in canvas coords, decode in original-image coords (the
            # two differ when the loader downscaled a large source image)
            preds, maxvals = val_step_grouped(
                variables, stack('imgs'), stack('center'), stack('scale'),
                stack('center_orig'), stack('scale_orig'),
                jnp.asarray(eidx) if eidx is not None else None)
            preds, maxvals = np.asarray(preds), np.asarray(maxvals)
        out = []
        for gi, batch in enumerate(batches):
            valid = batch['valid']
            kp = np.concatenate([preds[gi], maxvals[gi]], axis=-1)[valid]
            c = batch['center_orig'][valid]
            s = batch['scale_orig'][valid]
            area = np.prod(s * 200.0, axis=1, keepdims=True)
            boxes = np.concatenate(
                [c, s, area, batch['bbox_score'][valid][:, None]], axis=1)
            out.append(dict(
                preds=kp, boxes=boxes,
                image_paths=[p for p, v in zip(batch['image_paths'], valid)
                             if v],
                bbox_ids=[int(b) for b, v in zip(batch['bbox_id'], valid)
                          if v],
            ))
        return out

    results = []
    pending = []
    for bi, batch in enumerate(loader):
        pending.append(batch)
        if len(pending) == max(1, group_size):
            results.extend(decode_group(pending))
            pending = []
        if progress and bi % 50 == 0:
            print(f'  val batch {bi}/{len(loader)}')
    # remainder: one batch at a time through the single-batch step (a
    # partial group would recompile the scan for every remainder size)
    for batch in pending:
        results.extend(decode_group([batch]))
    return results


def collect_results(results, tmpdir):
    """Gather per-process result lists onto process 0 (counterpart of the
    reference `collect_results_cpu`, mmpose/apis/test.py:119: tmpdir +
    pickle + barrier). `tmpdir` must be on a filesystem shared by all
    hosts (e.g. under the work dir). Returns the merged list on process 0
    and None elsewhere; single-process calls return `results` unchanged.
    """
    import os
    import pickle
    import shutil

    import jax

    rank, world = jax.process_index(), jax.process_count()
    if world == 1:
        return results
    from jax.experimental import multihost_utils
    os.makedirs(tmpdir, exist_ok=True)
    with open(os.path.join(tmpdir, f'part_{rank}.pkl'), 'wb') as f:
        pickle.dump(results, f)
    multihost_utils.sync_global_devices('vitpose_eval_gather')
    merged = None
    if rank == 0:
        merged = []
        for r in range(world):
            with open(os.path.join(tmpdir, f'part_{r}.pkl'), 'rb') as f:
                merged.extend(pickle.load(f))
        shutil.rmtree(tmpdir, ignore_errors=True)
    # second barrier: writers must not return (and possibly exit) before
    # rank 0 has read every part file
    multihost_utils.sync_global_devices('vitpose_eval_done')
    return merged

"""Top-down preprocessing: host-side augmentation *parameters*, device-side
batched pixels.

The reference runs its whole pipeline per sample on CPU dataloader workers
(reference: mmpose/datasets/pipelines/top_down_transform.py — RandomFlip /
HalfBody / ScaleRotation / TopDownAffine(cv2.warpAffine) / NormalizeTensor /
GenerateTarget). The TPU-first split:

  * host (this file, numpy, cheap scalar math): sample per-record random
    flip / half-body crop / scale / rotation, flip joints, emit fixed-shape
    arrays (image, center, scale, rot, joints, vis).
  * device (`make_preprocess_fn`, one jit): batched affine crop (bilinear
    gather), imagenet normalization, and UDP/MSRA heatmap target generation —
    all fused by XLA; no per-sample Python.

IMPORTANT geometry parity: when the raw image is flipped, joints mirror with
``W - 1 - x`` and the center with ``W - 1 - cx`` (reference
top_down_transform.py:149-164), and target generation consumes the
*crop-space* joints produced by applying the same warp to the points.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.geometry import (affine_matrix, udp_warp_matrix,
                            apply_affine_to_points)
from ..ops.target import (generate_combined_target, generate_msra_heatmaps,
                          generate_udp_heatmaps)
from ..ops.warp import warp_affine_batch

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass
class AugmentConfig:
    flip_prob: float = 0.5
    half_body_prob: float = 0.3
    num_joints_half_body: int = 8
    scale_factor: float = 0.5
    rot_factor: float = 40.0
    rot_prob: float = 0.6
    shift_prob: float = 0.0          # TopDownRandomShiftBboxCenter
    shift_factor: float = 0.16
    trans_prob: float = 0.0          # TopDownRandomTranslation
    trans_factor: float = 0.15
    # image-level augs, applied by the loader on the host canvas before
    # the on-device crop warp. The reference runs these after TopDownAffine
    # (PhotometricDistortion / Albumentation, shared_transform.py:182,303);
    # pixel-wise ops commute with the bilinear warp, and dropout-hole
    # sizes stay within ~1.5x of the reference's crop-pixel sizes at the
    # usual canvas/person ratio. dict/True enables with (those) kwargs.
    photometric: object = None       # True | dict(**photometric_distortion)
    coarse_dropout: object = None    # True | dict(**coarse_dropout)
    grid_dropout: object = None      # True | dict(**grid_dropout)
    albumentations: object = None    # list of Albumentations transform dicts

    def has_image_augs(self):
        return bool(self.photometric or self.coarse_dropout
                    or self.grid_dropout or self.albumentations)


def sample_augmentations(rng: np.random.RandomState, record, info, image_w,
                         aug: AugmentConfig, image_size):
    """Host-side: draw augmentation params for one record, mirroring the
    reference transforms' distributions. Mutates a copy of the record and
    returns (center, scale, rot, joints, vis, flipped).

    Flip (reference TopDownRandomFlip, top_down_transform.py:122) mirrors
    the joints/center around the canvas width here on host — but the
    SOURCE pixel mirror (the reference's ``img[:, ::-1]``) happens on
    device, folded into the crop warp matrix by make_preprocess_fn's
    ``flip`` argument. Callers must pass the returned ``flipped`` flag
    through to the preprocess fn or flipped samples train on unflipped
    pixels."""
    joints = record['joints_3d'][:, :2].copy()
    vis = record['joints_3d_visible'][:, 0].copy()
    center = np.asarray(record['center'], np.float32).copy()
    scale = np.asarray(record['scale'], np.float32).copy()
    flipped = False

    if rng.rand() <= aug.flip_prob:
        flipped = True
        flip_index = info.flip_index
        joints = joints[flip_index]
        vis = vis[flip_index]
        joints[:, 0] = image_w - 1 - joints[:, 0]
        joints *= vis[:, None]
        center[0] = image_w - center[0] - 1

    # half-body (reference top_down_transform.py:176)
    if (vis.sum() > aug.num_joints_half_body
            and rng.rand() < aug.half_body_prob):
        upper = [j for j in info.upper_body_ids if vis[j] > 0]
        lower = [j for j in range(info.num_joints)
                 if j not in info.upper_body_ids and vis[j] > 0]
        if rng.randn() < 0.5 and len(upper) > 2:
            sel = upper
        elif len(lower) > 2:
            sel = lower
        else:
            sel = upper
        if len(sel) >= 2:
            pts = joints[sel]
            c = pts.mean(axis=0)
            lt, rb = pts.min(axis=0), pts.max(axis=0)
            w, h = rb[0] - lt[0], rb[1] - lt[1]
            ar = image_size[0] / image_size[1]
            if w > ar * h:
                h = w / ar
            elif w < ar * h:
                w = h * ar
            center = c.astype(np.float32)
            scale = np.array([w / 200.0, h / 200.0], np.float32) * 1.5

    if aug.shift_prob > 0 and rng.rand() < aug.shift_prob:
        center = center + rng.uniform(-1, 1, 2) * aug.shift_factor \
            * scale * 200.0

    # TopDownRandomTranslation (reference top_down_transform.py:816)
    if aug.trans_prob > 0 and rng.rand() <= aug.trans_prob:
        center = center + aug.trans_factor * rng.uniform(-1, 1, 2) \
            * scale * 200.0

    sf, rf = aug.scale_factor, aug.rot_factor
    scale = scale * np.clip(rng.randn() * sf + 1, 1 - sf, 1 + sf)
    rot = np.clip(rng.randn() * rf, -rf * 2, rf * 2) \
        if rng.rand() <= aug.rot_prob else 0.0

    return (center.astype(np.float32), scale.astype(np.float32),
            np.float32(rot), joints.astype(np.float32),
            vis.astype(np.float32), flipped)


def make_preprocess_fn(image_size=(192, 256), heatmap_size=(48, 64),
                       use_udp=True, sigma=2.0, with_targets=True,
                       unbiased=False, pad_num_joints=None,
                       target_type='GaussianHeatmap'):
    """Build the jitted device-side preprocessing function.

    fn(imgs_uint8 [N,H,W,3], center [N,2], scale [N,2], rot [N],
       joints [N,K,2], vis [N,K], flip [N] bool or None) ->
       dict(imgs [N,h,w,3] normalized, target [N,K,hh,hw], target_weight)

    Images must be pre-resized/padded to one static source shape on host
    (the crop warp handles arbitrary geometry via center/scale). ``flip``
    ([N] bool or None) marks samples whose center/joints were mirrored by
    sample_augmentations: for those, the SOURCE pixel mirror is folded
    into the pixel warp matrix (src-mirror F composed on the right:
    sampling the flipped canvas equals sampling the original at F(p)), so
    the crop pixels match the mirrored labels exactly — for both warp
    conventions and any rotation, with no pixel copies.
    """
    iw, ih = int(image_size[0]), int(image_size[1])
    if pad_num_joints is not None and target_type.lower() == 'regression':
        raise ValueError('pad_num_joints (ViTPose+ MoE padding) expects '
                         'heatmap targets, not Regression coordinates')

    @jax.jit
    def preprocess(imgs, center, scale, rot, joints, vis, flip=None):
        imgs = imgs.astype(jnp.float32) / 255.0
        if use_udp:
            mat = udp_warp_matrix(rot, center, scale, (iw, ih))
        else:
            mat = affine_matrix(center, scale, rot, (iw, ih))
        mat_pix = mat
        if flip is not None:
            # compose the source mirror: A'' = A @ F with
            # F = [[-1, 0, S-1], [0, 1, 0]]  (S = canvas width)
            f = jnp.asarray(flip).astype(bool)
            s_w = imgs.shape[2]
            col0 = mat[..., :, 0]
            flipped_mat = jnp.stack(
                [-col0, mat[..., :, 1],
                 mat[..., :, 2] + (s_w - 1) * col0], axis=-1)
            mat_pix = jnp.where(f[:, None, None], flipped_mat, mat)
        crops = warp_affine_batch(imgs, mat_pix, (iw, ih))
        crops = (crops - IMAGENET_MEAN) / IMAGENET_STD
        out = {'imgs': crops}
        if with_targets:
            joints_c = apply_affine_to_points(joints, mat)
            if target_type.lower() == 'regression':
                # DeepPose: normalized [0, 1] coordinates; weight masks
                # joints outside the crop (reference
                # top_down_transform.py:761 TopDownGenerateTargetRegression)
                size = jnp.asarray([iw, ih], jnp.float32)
                inside = ((joints_c[..., 0] >= 0)
                          & (joints_c[..., 0] <= iw - 1)
                          & (joints_c[..., 1] >= 0)
                          & (joints_c[..., 1] <= ih - 1))
                target = (joints_c / size).astype(jnp.float32)
                weight = (vis.astype(jnp.float32)
                          * inside.astype(jnp.float32))[..., None]
                weight = jnp.repeat(weight, 2, axis=-1)       # [N, K, 2]
            elif target_type.lower() == 'combinedtarget':
                # UDP CombinedTarget: [N, K, 3, H, W] -> 3K channels
                # (reference top_down_transform.py:625-653)
                t, weight = generate_combined_target(
                    joints_c, vis, (iw, ih), heatmap_size)
                target = t.reshape(t.shape[0], -1, *t.shape[-2:])
            elif use_udp:
                target, weight = generate_udp_heatmaps(
                    joints_c, vis, (iw, ih), heatmap_size, sigma=sigma)
            else:
                target, weight = generate_msra_heatmaps(
                    joints_c, vis, (iw, ih), heatmap_size, sigma=sigma,
                    unbiased=unbiased)
            if pad_num_joints is not None:
                k = target.shape[1]
                pad = int(pad_num_joints) - k
                if pad > 0:
                    # ViTPose+ pads targets to max_num_joints so one compiled
                    # step serves every dataset (reference
                    # top_down_transform.py:746-755)
                    target = jnp.pad(target,
                                     [(0, 0), (0, pad), (0, 0), (0, 0)])
                    weight = jnp.pad(weight, [(0, 0), (0, pad)])
            out['target'] = target
            out['target_weight'] = weight
        return out

    return preprocess


def make_host_crop_fn(image_size=(192, 256), use_udp=True):
    """CPU-backend jitted crop warp for the production wire format.

    A locally-attached TPU host warps canvases to model-input crops on
    the HOST and ships uint8 crops (8.3x less PCIe/wire traffic than
    full canvases; the reference ships exactly these — cv2.warpAffine
    uint8 crops from its dataloader workers,
    top_down_transform.py TopDownAffine). Pairs with
    :func:`make_device_finish_fn` (normalize + target painting stay on
    device).

    fn(imgs_uint8 [N,H,W,3], center, scale, rot, joints, flip) ->
       (crops uint8 [N,h,w,3], joints_in_crop [N,K,2])
    """
    iw, ih = int(image_size[0]), int(image_size[1])

    def host_crop(imgs, center, scale, rot, joints, flip=None):
        imgs = imgs.astype(jnp.float32)
        if use_udp:
            mat = udp_warp_matrix(rot, center, scale, (iw, ih))
        else:
            mat = affine_matrix(center, scale, rot, (iw, ih))
        mat_pix = mat
        if flip is not None:
            f = jnp.asarray(flip).astype(bool)
            s_w = imgs.shape[2]
            col0 = mat[..., :, 0]
            flipped_mat = jnp.stack(
                [-col0, mat[..., :, 1],
                 mat[..., :, 2] + (s_w - 1) * col0], axis=-1)
            mat_pix = jnp.where(f[:, None, None], flipped_mat, mat)
        crops = warp_affine_batch(imgs, mat_pix, (iw, ih))
        joints_c = apply_affine_to_points(joints, mat)
        crops = jnp.clip(jnp.round(crops), 0, 255).astype(jnp.uint8)
        return crops, joints_c

    return jax.jit(host_crop, backend='cpu')


def make_device_finish_fn(image_size=(192, 256), heatmap_size=(48, 64),
                          sigma=2.0, use_udp=True, unbiased=False):
    """Device-side completion of the crop-wire pipeline: normalize uint8
    crops + paint heatmap targets (the halves of make_preprocess_fn that
    stay on device when the warp ran on the host)."""
    iw, ih = int(image_size[0]), int(image_size[1])

    @jax.jit
    def finish(crops_u8, joints_c, vis):
        imgs = crops_u8.astype(jnp.float32) / 255.0
        imgs = (imgs - IMAGENET_MEAN) / IMAGENET_STD
        if use_udp:
            target, weight = generate_udp_heatmaps(
                joints_c, vis, (iw, ih), heatmap_size, sigma=sigma)
        else:
            target, weight = generate_msra_heatmaps(
                joints_c, vis, (iw, ih), heatmap_size, sigma=sigma,
                unbiased=unbiased)
        return {'imgs': imgs, 'target': target, 'target_weight': weight}

    return finish


def photometric_distortion(rng: np.random.RandomState, img,
                           brightness_delta=32, contrast_range=(0.5, 1.5),
                           saturation_range=(0.5, 1.5), hue_delta=18):
    """Random photometric augmentation on a uint8 RGB image (counterpart of
    reference shared_transform.py:303 `PhotometricDistortion`): brightness,
    contrast (random order), saturation, hue, channel swap."""
    import cv2
    img = img.astype(np.float32)

    if rng.randint(2):
        img += rng.uniform(-brightness_delta, brightness_delta)

    contrast_last = rng.randint(2)
    if not contrast_last and rng.randint(2):
        img *= rng.uniform(*contrast_range)

    # draw the gates/factors in the reference's RNG order, but only
    # round-trip through uint8 HSV when a branch actually fires (the
    # reference applies no transform at all on a no-op draw; an
    # unconditional conversion would quantize every image)
    sat_gate = rng.randint(2)
    sat_mult = rng.uniform(*saturation_range) if sat_gate else None
    hue_gate = rng.randint(2)
    hue_shift = rng.uniform(-hue_delta, hue_delta) if hue_gate else None
    if sat_gate or hue_gate:
        hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8),
                           cv2.COLOR_RGB2HSV).astype(np.float32)
        if sat_gate:
            hsv[..., 1] *= sat_mult
        if hue_gate:
            hsv[..., 0] = (hsv[..., 0] + hue_shift) % 180
        img = cv2.cvtColor(np.clip(hsv, 0, 255).astype(np.uint8),
                           cv2.COLOR_HSV2RGB).astype(np.float32)

    if contrast_last and rng.randint(2):
        img *= rng.uniform(*contrast_range)
    if rng.randint(2):
        img = img[..., rng.permutation(3)]
    return np.clip(img, 0, 255).astype(np.uint8)


def albumentation_transform(transforms):
    """Thin adapter for the `albumentations` library (counterpart of
    reference shared_transform.py:182 `Albumentation`). Returns a callable
    img -> img, or raises ImportError with guidance if the library is not
    installed (it is an optional dependency here as in the reference)."""
    try:
        import albumentations as A
    except ImportError as e:
        raise ImportError(
            'albumentation_transform requires the optional `albumentations` '
            'package; use photometric_distortion for built-in color '
            'augmentation') from e
    composed = A.Compose([getattr(A, t.pop('type'))(**t)
                          for t in [dict(t) for t in transforms]])

    def apply(img):
        return composed(image=img)['image']

    return apply


def coarse_dropout(rng: np.random.RandomState, img, max_holes=8,
                   max_height=40, max_width=40, min_holes=1, min_height=10,
                   min_width=10, p=0.5, fill_value=0):
    """Native CoarseDropout (the Albumentations transform the reference's
    hrnet_w32_coco_256x192_coarsedropout.py config uses): up to
    `max_holes` random rectangles filled with `fill_value`."""
    if rng.rand() >= p:
        return img
    img = img.copy()
    h, w = img.shape[:2]
    for _ in range(rng.randint(min_holes, max_holes + 1)):
        hh = rng.randint(min_height, max_height + 1)
        ww = rng.randint(min_width, max_width + 1)
        y = rng.randint(0, max(1, h - hh + 1))
        x = rng.randint(0, max(1, w - ww + 1))
        img[y:y + hh, x:x + ww] = fill_value
    return img


def grid_dropout(rng: np.random.RandomState, img, unit_size_min=10,
                 unit_size_max=40, ratio=0.5, random_offset=True, p=0.5,
                 fill_value=0):
    """Native GridDropout (the Albumentations transform the reference's
    hrnet_w32_coco_256x192_gridmask.py config uses): a square grid of
    `unit`-sized cells, each with a `ratio*unit` hole."""
    if rng.rand() >= p:
        return img
    img = img.copy()
    h, w = img.shape[:2]
    unit = int(rng.randint(unit_size_min, unit_size_max + 1))
    hole = max(1, int(unit * ratio))
    oy = int(rng.randint(0, unit)) if random_offset else 0
    ox = int(rng.randint(0, unit)) if random_offset else 0
    for y in range(-oy, h, unit):
        for x in range(-ox, w, unit):
            img[max(0, y):max(0, y + hole),
                max(0, x):max(0, x + hole)] = fill_value
    return img


def apply_image_augmentations(rng: np.random.RandomState, img,
                              aug: 'AugmentConfig', _cache={}):
    """Config-driven image-level augmentation dispatch (loader hook)."""
    def kw(v):
        return v if isinstance(v, dict) else {}
    if aug.photometric:
        img = photometric_distortion(rng, img, **kw(aug.photometric))
    if aug.coarse_dropout:
        img = coarse_dropout(rng, img, **kw(aug.coarse_dropout))
    if aug.grid_dropout:
        img = grid_dropout(rng, img, **kw(aug.grid_dropout))
    if aug.albumentations:
        key = id(aug)
        if key not in _cache:
            _cache[key] = albumentation_transform(
                [dict(t) for t in aug.albumentations])
        img = _cache[key](img)
    return img


# ---------------------------------------------------------------------------
# multi-item / multitask record utilities
# (reference shared_transform.py:428 MultiItemProcess, :452
#  DiscardDuplicatedItems, :472 MultitaskGatherTarget, :509 RenameKeys)
# ---------------------------------------------------------------------------

def multi_item_process(fn, items):
    """Apply `fn` (record dict -> record dict) to each item of a keyed
    collection and merge the per-key outputs into lists (reference
    `MultiItemProcess`): {id: record} -> {field: [value_per_item, ...]}.

    Used by multi-frame/multi-view pipelines where one sample carries
    several images that share the downstream transform."""
    merged = {}
    for _, item in items.items():
        out = fn(item)
        for k, v in out.items():
            merged.setdefault(k, []).append(v)
    return merged


def discard_duplicated_items(record, keys):
    """Collapse per-item lists that are known identical across items back
    to a single value (reference `DiscardDuplicatedItems`): keeps
    `record[k][0]` for every k in `keys`."""
    out = dict(record)
    for k in keys:
        if k in out:
            out[k] = out[k][0]
    return out


def multitask_gather_target(target_fns, record, indices=None,
                            keys=('target', 'target_weight')):
    """Build per-head training targets for MultiTaskModel (reference
    `MultitaskGatherTarget`): run every target pipeline on the record,
    then gather `keys` per head by `indices` (head i uses pipeline
    indices[i]; None -> identity mapping).

    Args:
      target_fns: list of callables record -> dict with `keys` set.
      record: the shared sample dict (joints, visibility, sizes, ...).

    Returns the record extended with, for each key, a list with one entry
    per head (None when that pipeline did not produce the key)."""
    outputs = [fn(dict(record)) for fn in target_fns]
    if indices is None:
        indices = list(range(len(target_fns)))
    out = dict(record)
    for key in keys:
        out[key] = [outputs[i].get(key) for i in indices]
    return out


def rename_keys(record, key_pairs):
    """Rename record fields (reference `RenameKeys`): each (src, tgt)
    moves record[src] to record[tgt]."""
    out = dict(record)
    for src, tgt in key_pairs:
        out[tgt] = out.pop(src)
    return out

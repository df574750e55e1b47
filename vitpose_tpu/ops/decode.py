"""On-device heatmap -> keypoint decoding, vectorized over (N, K).

TPU-first rewrite of the reference host-side numpy/cv2 decode
(reference: mmpose/core/evaluation/top_down_eval.py:474
`keypoints_from_heatmaps` and helpers). The reference loops over persons and
joints on the host after a device->host sync; here the whole decode — argmax,
Gaussian modulation, DARK/UDP Newton refinement, and the un-crop back to image
space — is one jit-compiled program, so flip-test + decode never leave the
device.

cv2 compatibility notes:
  * `cv2.getGaussianKernel(k, 0)` uses a fixed binomial-like table for
    k in {1, 3, 5, 7} and sigma = 0.3*((k-1)*0.5 - 1) + 0.8 otherwise;
    reproduced in :func:`gaussian_kernel1d` (golden-tested against cv2).
  * `cv2.GaussianBlur` uses BORDER_REFLECT_101; reproduced via explicit
    reflect padding (:func:`gaussian_blur_reflect`).
  * The 'unbiased'/'megvii' modulation (reference `_gaussian_blur`,
    top_down_eval.py:399) blurs a zero-padded copy and rescales to preserve
    the original max — equivalent to zero-padding convolution + max rescale.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import transform_preds

# cv2's fixed small kernels for getGaussianKernel(ksize, sigma<=0), ksize<=7.
_CV2_SMALL_GAUSSIAN = {
    1: np.array([1.0]),
    3: np.array([0.25, 0.5, 0.25]),
    5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625]),
    7: np.array([0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375,
                 0.03125]),
}


def gaussian_kernel1d(ksize: int) -> np.ndarray:
    """cv2.getGaussianKernel(ksize, 0) equivalent (host-side constant)."""
    if ksize in _CV2_SMALL_GAUSSIAN:
        return _CV2_SMALL_GAUSSIAN[ksize].astype(np.float32)
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


@functools.lru_cache(maxsize=32)
def _band_matrix(n, kernel_key):
    """[n, n] zero-padded cross-correlation band matrix for a 1D kernel."""
    kernel1d = np.asarray(kernel_key, np.float32)
    k = len(kernel1d)
    pad = (k - 1) // 2
    m = np.zeros((n, n), np.float32)
    idx = np.arange(n)
    for j, c in enumerate(kernel1d):
        src = idx + j - pad
        ok = (src >= 0) & (src < n)
        m[idx[ok], src[ok]] += c
    return m


def _sep_blur(heatmaps, kernel1d):
    """Separable 2D convolution over the last two axes, zero padding.

    Implemented as two band-matrix matmuls — on TPU this runs the blur on
    the MXU as large GEMMs instead of thousands of single-channel
    convolutions (the conv path cost ~3x the whole decode).
    precision=HIGHEST keeps the log-space DARK refinement exact."""
    h, w = heatmaps.shape[-2:]
    key = tuple(np.asarray(kernel1d, np.float32).tolist())
    mh = jnp.asarray(_band_matrix(h, key))
    mw = jnp.asarray(_band_matrix(w, key))
    x = jnp.einsum('hH,...Hw->...hw', mh, heatmaps,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum('...hW,wW->...hw', x, mw,
                      precision=jax.lax.Precision.HIGHEST)


def gaussian_blur_reflect(heatmaps, ksize: int):
    """cv2.GaussianBlur(ksize, sigma=0) with BORDER_REFLECT_101 semantics."""
    kernel1d = gaussian_kernel1d(ksize)
    pad = (ksize - 1) // 2
    padded = jnp.pad(
        heatmaps,
        [(0, 0)] * (heatmaps.ndim - 2) + [(pad, pad), (pad, pad)],
        mode='reflect')
    blurred = _sep_blur(padded, kernel1d)
    return blurred[..., pad:-pad, pad:-pad]


def gaussian_modulate(heatmaps, ksize: int):
    """Reference `_gaussian_blur` (top_down_eval.py:399): zero-pad blur with
    per-map rescale so the max matches the original max."""
    orig_max = jnp.max(heatmaps, axis=(-2, -1), keepdims=True)
    blurred = _sep_blur(heatmaps, gaussian_kernel1d(ksize))
    new_max = jnp.max(blurred, axis=(-2, -1), keepdims=True)
    return blurred * (orig_max / jnp.maximum(new_max, 1e-20))


def heatmaps_to_coords(heatmaps):
    """Argmax decode: [N, K, H, W] -> (coords [N,K,2] xy, maxvals [N,K,1]).

    Ties resolve to the first (row-major) max like np.argmax; coords are -1
    where maxval <= 0 (parity: top_down_eval.py:63 `_get_max_preds`).
    """
    n, k, h, w = heatmaps.shape
    flat = heatmaps.reshape(n, k, h * w)
    idx = jnp.argmax(flat, axis=-1)
    maxvals = jnp.max(flat, axis=-1, keepdims=True)
    x = (idx % w).astype(jnp.float32)
    y = (idx // w).astype(jnp.float32)
    coords = jnp.stack([x, y], axis=-1)
    coords = jnp.where(maxvals > 0.0, coords, -1.0)
    return coords, maxvals


def _gather_hm(heatmaps, px, py):
    """Gather heatmaps[n, k, py, px] with clipped integer coords."""
    n, k, h, w = heatmaps.shape
    px = jnp.clip(px, 0, w - 1)
    py = jnp.clip(py, 0, h - 1)
    flat = heatmaps.reshape(n, k, h * w)
    return jnp.take_along_axis(flat, (py * w + px)[..., None],
                               axis=-1)[..., 0]


def _default_shift(heatmaps, coords, extra=0.0):
    """±0.25 shift toward the larger neighbor (top_down_eval.py:598-610).

    `extra` is megvii's additional +0.5, which the reference applies
    INSIDE the same border guard (top_down_eval.py:610-612) — border
    keypoints receive neither shift."""
    _, _, h, w = heatmaps.shape
    px = coords[..., 0].astype(jnp.int32)
    py = coords[..., 1].astype(jnp.int32)
    dx = _gather_hm(heatmaps, px + 1, py) - _gather_hm(heatmaps, px - 1, py)
    dy = _gather_hm(heatmaps, px, py + 1) - _gather_hm(heatmaps, px, py - 1)
    ok = (px > 1) & (px < w - 1) & (py > 1) & (py < h - 1)
    shift = jnp.stack([jnp.sign(dx), jnp.sign(dy)], axis=-1) * 0.25 + extra
    return coords + jnp.where(ok[..., None], shift, 0.0)


def _taylor_refine(log_heatmaps, coords):
    """DARK Taylor-expansion refinement (top_down_eval.py:298 `_taylor`)."""
    _, _, h, w = log_heatmaps.shape
    px = coords[..., 0].astype(jnp.int32)
    py = coords[..., 1].astype(jnp.int32)
    g = functools.partial(_gather_hm, log_heatmaps)
    dx = 0.5 * (g(px + 1, py) - g(px - 1, py))
    dy = 0.5 * (g(px, py + 1) - g(px, py - 1))
    dxx = 0.25 * (g(px + 2, py) - 2 * g(px, py) + g(px - 2, py))
    dxy = 0.25 * (g(px + 1, py + 1) - g(px - 1, py + 1)
                  - g(px + 1, py - 1) + g(px - 1, py - 1))
    dyy = 0.25 * (g(px, py + 2) - 2 * g(px, py) + g(px, py - 2))
    det = dxx * dyy - dxy * dxy
    inside = (px > 1) & (px < w - 2) & (py > 1) & (py < h - 2) & (det != 0)
    # offset = -H^{-1} grad, closed-form 2x2 inverse
    off_x = -(dyy * dx - dxy * dy) / jnp.where(det == 0, 1.0, det)
    off_y = -(-dxy * dx + dxx * dy) / jnp.where(det == 0, 1.0, det)
    offset = jnp.stack([off_x, off_y], axis=-1)
    return coords + jnp.where(inside[..., None], offset, 0.0)


def post_dark_udp(coords, heatmaps, kernel=3):
    """UDP/DARK refinement, batched (top_down_eval.py:335 `post_dark_udp`,
    default kernel=3 like the reference — top-down callers pass the config
    modulate_kernel explicitly; the bottom-up parser relies on the default).

    coords: [N, K, 2] integer argmax positions; heatmaps: [N, K, H, W].
    Blur (reflect-101) -> clip -> log -> one Newton step from the gradient and
    Hessian sampled on the 3x3 neighborhood (edge-padded).
    """
    n, k, h, w = heatmaps.shape
    hm = gaussian_blur_reflect(heatmaps, kernel)
    hm = jnp.log(jnp.clip(hm, 0.001, 50.0))
    hm = jnp.pad(hm, [(0, 0), (0, 0), (1, 1), (1, 1)], mode='edge')

    px = coords[..., 0].astype(jnp.int32) + 1
    py = coords[..., 1].astype(jnp.int32) + 1
    hp, wp = h + 2, w + 2
    flat = hm.reshape(n, k, hp * wp)

    def g(dx, dy):
        idx = jnp.clip((py + dy) * wp + (px + dx), 0, hp * wp - 1)
        return jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]

    i_ = g(0, 0)
    ix1, ix1_ = g(1, 0), g(-1, 0)
    iy1, iy1_ = g(0, 1), g(0, -1)
    ix1y1 = g(1, 1)
    ix1_y1_ = g(-1, -1)

    dx = 0.5 * (ix1 - ix1_)
    dy = 0.5 * (iy1 - iy1_)
    dxx = ix1 - 2.0 * i_ + ix1_
    dyy = iy1 - 2.0 * i_ + iy1_
    dxy = 0.5 * (ix1y1 - ix1 - iy1 + 2.0 * i_ - ix1_ - iy1_ + ix1_y1_)

    eps = jnp.float32(np.finfo(np.float32).eps)
    a, b, c, d = dxx + eps, dxy, dxy, dyy + eps
    det = a * d - b * c
    inv_a, inv_b = d / det, -b / det
    inv_c, inv_d = -c / det, a / det
    off_x = inv_a * dx + inv_b * dy
    off_y = inv_c * dx + inv_d * dy
    return coords - jnp.stack([off_x, off_y], axis=-1)


def decode_combined_target(heatmaps, kernel=11, valid_radius_factor=0.0546875):
    """Decode UDP CombinedTarget maps [N, 3K, H, W] -> coords [N,K,2], maxvals.

    Response channels are blurred with 2*kernel+1, offset channels with
    kernel; the offset at the response argmax is added
    (parity: top_down_eval.py:571-585).
    """
    n, c3, h, w = heatmaps.shape
    k = c3 // 3
    hm = heatmaps.reshape(n, k, 3, h, w)
    resp = gaussian_blur_reflect(hm[:, :, 0], 2 * kernel + 1)
    off_x = gaussian_blur_reflect(hm[:, :, 1], kernel)
    off_y = gaussian_blur_reflect(hm[:, :, 2], kernel)
    valid_radius = valid_radius_factor * h
    coords, maxvals = heatmaps_to_coords(resp)
    px = coords[..., 0].astype(jnp.int32)
    py = coords[..., 1].astype(jnp.int32)
    ox = _gather_hm(off_x, px, py) * valid_radius
    oy = _gather_hm(off_y, px, py) * valid_radius
    coords = coords + jnp.stack([ox, oy], axis=-1)
    return coords, maxvals


def keypoints_from_heatmaps(heatmaps, center, scale, post_process='default',
                            unbiased=False, kernel=11, use_udp=False,
                            target_type='GaussianHeatmap',
                            valid_radius_factor=0.0546875):
    """Full decode: heatmaps [N,K,H,W] -> (preds [N,K,2] image coords,
    maxvals [N,K,1]). jit-able; parity with reference
    top_down_eval.py:474 `keypoints_from_heatmaps` for post_process in
    {None, 'default', 'unbiased', 'megvii'} x use_udp x target_type.
    """
    heatmaps = jnp.asarray(heatmaps, jnp.float32)
    if unbiased:
        post_process = 'unbiased'
    _, _, h, w = (heatmaps.shape[0], heatmaps.shape[1],
                  heatmaps.shape[2], heatmaps.shape[3])

    if use_udp:
        if target_type.lower() == 'gaussianheatmap':
            coords, maxvals = heatmaps_to_coords(heatmaps)
            coords = post_dark_udp(coords, heatmaps, kernel=kernel)
        elif target_type.lower() == 'combinedtarget':
            coords, maxvals = decode_combined_target(
                heatmaps, kernel=kernel,
                valid_radius_factor=valid_radius_factor)
        else:
            raise ValueError(f'bad target_type {target_type}')
    else:
        if post_process == 'megvii':
            heatmaps = gaussian_modulate(heatmaps, kernel)
        coords, maxvals = heatmaps_to_coords(heatmaps)
        if post_process == 'unbiased':
            log_hm = jnp.log(jnp.maximum(
                gaussian_modulate(heatmaps, kernel), 1e-10))
            coords = _taylor_refine(log_hm, coords)
        elif post_process is not None:
            coords = _default_shift(
                heatmaps, coords,
                extra=0.5 if post_process == 'megvii' else 0.0)

    hm_w = heatmaps.shape[3]
    hm_h = heatmaps.shape[2]
    preds = transform_preds(coords, center, scale, (hm_w, hm_h),
                            use_udp=use_udp)
    if post_process == 'megvii':
        maxvals = maxvals / 255.0 + 0.5
    return preds, maxvals


# ---------------------------------------------------------------------------
# accuracy metrics (train-time monitoring), on-device
# ---------------------------------------------------------------------------

def pose_pck_accuracy(output, target, mask, thr=0.05):
    """On-device PCK from heatmaps (parity: top_down_eval.py:136, but jnp so
    it never forces a device->host sync inside the train step).

    Returns (avg_acc scalar, valid_count scalar). Per-keypoint accuracies are
    averaged over keypoints with >=1 valid sample.
    """
    n, k, h, w = output.shape
    pred, _ = heatmaps_to_coords(output)
    gt, _ = heatmaps_to_coords(target)
    # The reference normalizes (x, y) by [H, W] in that order — a quirk of
    # _calc_distances' `normalize` layout; preserved for metric parity.
    norm = jnp.array([h, w], jnp.float32)
    dist = jnp.linalg.norm((pred - gt) / norm, axis=-1)      # [N, K]
    valid = mask.astype(bool)
    hit = (dist < thr) & valid
    per_kpt_valid = jnp.sum(valid, axis=0)                    # [K]
    per_kpt_acc = jnp.where(per_kpt_valid > 0,
                            jnp.sum(hit, axis=0) / jnp.maximum(per_kpt_valid, 1),
                            -1.0)
    kpt_has_valid = per_kpt_acc >= 0
    cnt = jnp.sum(kpt_has_valid)
    avg = jnp.where(cnt > 0,
                    jnp.sum(jnp.where(kpt_has_valid, per_kpt_acc, 0.0))
                    / jnp.maximum(cnt, 1), 0.0)
    return avg, cnt


def heatmaps3d_to_coords(heatmaps):
    """Argmax decode of 3D heatmaps [N, K, D, H, W] -> (coords [N,K,3]
    (x, y, z), maxvals [N,K,1]) (parity: top_down_eval.py:98
    `_get_max_preds_3d`)."""
    n, k, d, h, w = heatmaps.shape
    flat = heatmaps.reshape(n, k, d * h * w)
    idx = jnp.argmax(flat, axis=-1)
    maxvals = jnp.max(flat, axis=-1, keepdims=True)
    z = (idx // (h * w)).astype(jnp.float32)
    y = ((idx // w) % h).astype(jnp.float32)
    x = (idx % w).astype(jnp.float32)
    coords = jnp.stack([x, y, z], axis=-1)
    return jnp.where(maxvals > 0.0, coords, -1.0), maxvals


def keypoints_from_heatmaps3d(heatmaps, center, scale):
    """3D heatmaps -> image-space (x, y) + depth-bin z
    (parity: top_down_eval.py:625)."""
    coords, maxvals = heatmaps3d_to_coords(heatmaps)
    w = heatmaps.shape[4]
    h = heatmaps.shape[3]
    xy = transform_preds(coords[..., :2], center, scale, (w, h))
    return jnp.concatenate([xy, coords[..., 2:]], axis=-1), maxvals


# ---------------------------------------------------------------------------
# host-side keypoint metrics (numpy; parity: top_down_eval.py:179-295)
# ---------------------------------------------------------------------------

def _normalized_distances(pred, gt, mask, normalize):
    """[N,K,D] preds/gts, [N,K] mask, [N,D] normalize -> [K,N] distances
    with -1 for invisible (parity: top_down_eval.py:10 `_calc_distances`)."""
    pred = np.asarray(pred, np.float32)
    gt = np.asarray(gt, np.float32)
    mask = np.asarray(mask, bool)
    normalize = np.asarray(normalize, np.float32).copy()
    n, k, _ = pred.shape
    _mask = mask.copy()
    _mask[np.where((normalize == 0).sum(1))[0], :] = False
    dists = np.full((n, k), -1, np.float32)
    normalize[normalize <= 0] = 1e6
    dists[_mask] = np.linalg.norm(
        ((pred - gt) / normalize[:, None, :])[_mask], axis=-1)
    return dists.T


def keypoint_pck_accuracy(pred, gt, mask, thr, normalize):
    """-> (per-kpt acc [K] with -1 for empty, avg_acc, n_valid_kpts)."""
    dists = _normalized_distances(pred, gt, mask, normalize)
    accs = []
    for d in dists:
        valid = d != -1
        accs.append((d[valid] < thr).mean() if valid.any() else -1.0)
    accs = np.asarray(accs, np.float32)
    valid_accs = accs[accs >= 0]
    return accs, (valid_accs.mean() if len(valid_accs) else 0.0), \
        len(valid_accs)


def keypoint_auc(pred, gt, mask, normalize, num_step=20):
    """Area under the PCK curve over thresholds [0, 1) (top_down_eval:218)."""
    nor = np.tile(np.array([[normalize, normalize]]), (len(pred), 1))
    ys = [keypoint_pck_accuracy(pred, gt, mask, 1.0 * i / num_step, nor)[1]
          for i in range(num_step)]
    return float(np.mean(ys))


def keypoint_nme(pred, gt, mask, normalize_factor):
    """Normalized mean error (top_down_eval.py:250)."""
    dists = _normalized_distances(pred, gt, mask, normalize_factor)
    valid = dists[dists != -1]
    return float(valid.sum() / max(1, len(valid)))


def keypoint_epe(pred, gt, mask):
    """End-point error in pixels (top_down_eval.py:273)."""
    ones = np.ones((len(pred), np.asarray(pred).shape[2]), np.float32)
    dists = _normalized_distances(pred, gt, mask, ones)
    valid = dists[dists != -1]
    return float(valid.sum() / max(1, len(valid)))


def keypoints_from_regression(regression_preds, center, scale, img_size):
    """Regression-head outputs (normalized 0..1 coords) -> image-space
    keypoints (reference top_down_eval.py:441
    `keypoints_from_regression`). Returns (preds [N, K, 2],
    maxvals [N, K, 1] of ones — regression has no confidence map)."""
    import numpy as np
    from .geometry import transform_preds
    px = np.asarray(regression_preds, np.float32) * np.asarray(
        img_size, np.float32)
    n, k = px.shape[:2]
    # transform_preds is batched over the leading dim — one dispatch
    out = np.asarray(transform_preds(px, np.asarray(center),
                                     np.asarray(scale), img_size))
    return out, np.ones((n, k, 1), np.float32)


def multilabel_classification_accuracy(pred, gt, mask, thr=0.5):
    """Exact-match multi-label accuracy over samples with full ground
    truth (reference top_down_eval.py:658; InterHand hand-type metric):
    a sample counts as correct only when every label is on the right
    side of `thr`."""
    import numpy as np
    pred, gt, mask = (np.asarray(a) for a in (pred, gt, mask))
    valid = (mask > 0).min(axis=1) if mask.ndim == 2 else (mask > 0)
    pred, gt = pred[valid], gt[valid]
    if pred.shape[0] == 0:
        return 0.0
    return float((((pred - thr) * (gt - thr)) > 0).all(axis=1).mean())

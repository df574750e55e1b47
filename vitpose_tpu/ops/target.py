"""Heatmap target generation, vectorized over (batch, joints) in pure jnp.

TPU-first rewrite of the reference per-joint Python loops
(reference: mmpose/datasets/pipelines/top_down_transform.py:409-661,
`TopDownGenerateTarget._msra_generate_target` / `_udp_generate_target`).

The reference paints a (6σ+1)² gaussian patch into a window around the
integer-rounded joint position and zeroes the weight when the window misses
the map. We reproduce that exactly with full-grid masked gaussians — the
patch values equal the full gaussian inside the window and 0 outside, so a
window mask gives bit-identical targets without scatter ops.

All functions take joints in input-image pixel space and are jit/vmap-ready
with static shapes, so target generation can be fused into the device-side
preprocessing step (no per-sample host work).
"""
from __future__ import annotations

import jax.numpy as jnp


def _trunc_int(v):
    """Python ``int()`` semantics (truncate toward zero) as jnp."""
    return jnp.trunc(v).astype(jnp.int32)


def _grid(heatmap_size):
    w, h = int(heatmap_size[0]), int(heatmap_size[1])
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    return xs, ys


def generate_msra_heatmaps(joints, visible, image_size, heatmap_size,
                           sigma=2.0, unbiased=False):
    """Classic MSRA gaussian targets.

    Args:
      joints:  [..., K, 2] keypoints in input-image pixels.
      visible: [..., K] visibility (>0.5 means paint the gaussian).
      image_size: static (w, h) of the network input.
      heatmap_size: static (w, h) of the heatmap.
      sigma: gaussian std-dev in heatmap pixels.
      unbiased: DARK-style continuous-center encoding
        (reference top_down_transform.py:435-458); biased variant rounds the
        center to the nearest grid point and restricts to a 3σ window
        (reference :459-489).

    Returns:
      target [..., K, H, W] float32, weight [..., K] float32.
    """
    joints = jnp.asarray(joints, jnp.float32)
    visible = jnp.asarray(visible, jnp.float32)
    w, h = int(heatmap_size[0]), int(heatmap_size[1])
    stride = jnp.array([image_size[0] / w, image_size[1] / h], jnp.float32)
    tmp_size = sigma * 3.0

    mu = joints[..., :2] / stride                     # [..., K, 2] continuous
    xs, ys = _grid(heatmap_size)

    if unbiased:
        mu_x, mu_y = mu[..., 0], mu[..., 1]
        # window test on the continuous center
        oob = ((mu_x - tmp_size >= w) | (mu_y - tmp_size >= h)
               | (mu_x + tmp_size + 1 < 0) | (mu_y + tmp_size + 1 < 0))
        weight = jnp.where(oob, 0.0, visible)
        gx = xs - mu_x[..., None]                     # [..., K, W]
        gy = ys - mu_y[..., None]                     # [..., K, H]
        g = jnp.exp(-(gx[..., None, :] ** 2 + gy[..., :, None] ** 2)
                    / (2.0 * sigma ** 2))
        target = jnp.where((weight > 0.5)[..., None, None], g, 0.0)
        return target.astype(jnp.float32), weight
    else:
        mu_i = _trunc_int(mu + 0.5)                   # [..., K, 2]
        ul = mu_i - int(tmp_size)
        br = mu_i + int(tmp_size) + 1
        oob = ((ul[..., 0] >= w) | (ul[..., 1] >= h)
               | (br[..., 0] < 0) | (br[..., 1] < 0))
        weight = jnp.where(oob, 0.0, visible)
        mu_f = mu_i.astype(jnp.float32)
        gx = xs - mu_f[..., 0][..., None]             # [..., K, W]
        gy = ys - mu_f[..., 1][..., None]             # [..., K, H]
        g = jnp.exp(-(gx[..., None, :] ** 2 + gy[..., :, None] ** 2)
                    / (2.0 * sigma ** 2))
        # restrict to the pasted window [-3σ, 3σ] around the integer center
        in_win = ((jnp.abs(gx) <= tmp_size)[..., None, :]
                  & (jnp.abs(gy) <= tmp_size)[..., :, None])
        g = jnp.where(in_win, g, 0.0)
        target = jnp.where((weight > 0.5)[..., None, None], g, 0.0)
        return target.astype(jnp.float32), weight


def generate_udp_heatmaps(joints, visible, image_size, heatmap_size,
                          sigma=2.0):
    """UDP GaussianHeatmap targets (unit-length grid convention).

    feat_stride = (image_size - 1) / (heatmap_size - 1); the gaussian center
    is the exact continuous position while the paste window is anchored at
    the rounded center (reference top_down_transform.py:541-623).

    Returns: target [..., K, H, W], weight [..., K].
    """
    joints = jnp.asarray(joints, jnp.float32)
    visible = jnp.asarray(visible, jnp.float32)
    w, h = int(heatmap_size[0]), int(heatmap_size[1])
    stride = jnp.array([(image_size[0] - 1.0) / (w - 1.0),
                        (image_size[1] - 1.0) / (h - 1.0)], jnp.float32)
    tmp_size = sigma * 3.0

    mu = joints[..., :2] / stride                     # continuous center
    mu_i = _trunc_int(mu + 0.5)                       # window anchor
    ul = mu_i - int(tmp_size)
    br = mu_i + int(tmp_size) + 1
    oob = ((ul[..., 0] >= w) | (ul[..., 1] >= h)
           | (br[..., 0] < 0) | (br[..., 1] < 0))
    weight = jnp.where(oob, 0.0, visible)

    xs, ys = _grid(heatmap_size)
    gx = xs - mu[..., 0][..., None]                   # exact center, [..., K, W]
    gy = ys - mu[..., 1][..., None]
    g = jnp.exp(-(gx[..., None, :] ** 2 + gy[..., :, None] ** 2)
                / (2.0 * sigma ** 2))
    win_x = jnp.abs(xs - mu_i[..., 0][..., None].astype(jnp.float32)) <= tmp_size
    win_y = jnp.abs(ys - mu_i[..., 1][..., None].astype(jnp.float32)) <= tmp_size
    g = jnp.where(win_x[..., None, :] & win_y[..., :, None], g, 0.0)
    target = jnp.where((weight > 0.5)[..., None, None], g, 0.0)
    return target.astype(jnp.float32), weight


def generate_combined_target(joints, visible, image_size, heatmap_size,
                             valid_radius_factor=0.0546875):
    """UDP CombinedTarget: per-joint (response, x-offset, y-offset) maps.

    Parity: reference top_down_transform.py:625-653. Returns
    target [..., K, 3, H, W] (callers flatten to 3K channels), weight [..., K].
    """
    joints = jnp.asarray(joints, jnp.float32)
    visible = jnp.asarray(visible, jnp.float32)
    w, h = int(heatmap_size[0]), int(heatmap_size[1])
    stride = jnp.array([(image_size[0] - 1.0) / (w - 1.0),
                        (image_size[1] - 1.0) / (h - 1.0)], jnp.float32)
    valid_radius = valid_radius_factor * h

    mu = joints[..., :2] / stride                     # [..., K, 2]
    xs, ys = _grid(heatmap_size)
    x_off = (mu[..., 0][..., None, None] - xs[None, :]) / valid_radius
    y_off = (mu[..., 1][..., None, None] - ys[:, None]) / valid_radius
    keep = (x_off ** 2 + y_off ** 2) <= 1.0
    vis = (visible > 0.5)[..., None, None]
    resp = jnp.where(keep & vis, 1.0, 0.0)
    x_map = jnp.where(keep & vis, x_off, 0.0)
    y_map = jnp.where(keep & vis, y_off, 0.0)
    target = jnp.stack([resp, x_map, y_map], axis=-3)  # [..., K, 3, H, W]
    return target.astype(jnp.float32), visible


def generate_megvii_heatmaps(joints, visible, image_size, heatmap_size,
                             kernel=11):
    """Megvii target encoding (reference top_down_transform.py:496
    `_megvii_generate_target`): a delta at the truncated-int target pixel,
    cv2 GaussianBlur(kernel, sigma=0), rescaled so the peak equals 255.

    Args:
      joints:  [..., K, 2] keypoints in input-image pixels.
      visible: [..., K] visibility.
      kernel:  odd blur kernel size (per-joint kernels in the reference's
               multi-stage configs are just repeated calls).

    Returns: target [..., K, H, W] float32 (peak 255), weight [..., K].
    """
    from .decode import gaussian_blur_reflect
    joints = jnp.asarray(joints, jnp.float32)
    visible = jnp.asarray(visible, jnp.float32)
    w, h = int(heatmap_size[0]), int(heatmap_size[1])
    tx = _trunc_int(joints[..., 0] * w / image_size[0])      # [..., K]
    ty = _trunc_int(joints[..., 1] * h / image_size[1])
    inb = (tx >= 0) & (tx < w) & (ty >= 0) & (ty < h)
    weight = jnp.where(visible >= 1, jnp.where(inb, visible, 0.0), visible)
    paint = (visible >= 1) & inb
    txc = jnp.clip(tx, 0, w - 1)
    tyc = jnp.clip(ty, 0, h - 1)
    xs, ys = _grid(heatmap_size)
    onehot = ((xs[None, :] == txc[..., None, None])
              & (ys[:, None] == tyc[..., None, None])).astype(jnp.float32)
    onehot = jnp.where(paint[..., None, None], onehot, 0.0)
    blurred = gaussian_blur_reflect(onehot, kernel)
    # peak value at the target pixel (the delta blurred = kernel center,
    # possibly boosted by border reflection)
    maxi = jnp.take_along_axis(
        jnp.take_along_axis(blurred, tyc[..., None, None], axis=-2),
        txc[..., None, None], axis=-1)[..., 0, 0]
    scale = jnp.where(paint, 255.0 / jnp.maximum(maxi, 1e-20), 0.0)
    return blurred * scale[..., None, None], weight


# ---------------------------------------------------------------------------
# 3D target generators (host-side data prep for the 3D pipelines)
# ---------------------------------------------------------------------------

def generate_3d_heatmaps(joints_3d, visible, image_size, heatmap_size,
                         depth_bound, sigma=2.0, max_bound=1.0,
                         joint_indices=None, joint_weights=None):
    """2.5D gaussian-volume targets (reference pose3d_transform.py:470
    `Generate3DHeatmapTarget`; drives InterHand3D training).

    Args:
      joints_3d: [K, 3] — (x, y) in input-image pixels, z metric within
        ±depth_bound/2.
      visible: [K] or [K, 3] visibility.
      image_size: (w, h) input size; heatmap_size: (W, H, D).
      depth_bound: metric depth range mapped onto the D bins.

    Returns (target [K, D, H, W] float32, weight [K, 1]).

    The reference paints a (6σ+1)³ cube of gaussian values at coordinates
    that are rounded then clipped per axis — so the value at each touched
    voxel depends only on its own (clipped) coordinates and the gaussian
    factorizes into three 1-D vectors; we exploit that to paint each
    joint's cube as a rank-1 outer product instead of a 4-D scatter.
    """
    import numpy as np
    joints_3d = np.asarray(joints_3d, np.float32)
    visible = np.asarray(visible, np.float32)
    if visible.ndim == 2:
        visible = visible[:, 0]
    if joint_indices is not None:
        joints_3d = joints_3d[joint_indices]
        visible = visible[joint_indices]
        if joint_weights is not None:
            joint_weights = np.asarray(joint_weights)[joint_indices]
    num_joints = joints_3d.shape[0]
    W, H, D = (int(s) for s in heatmap_size)
    mu_x = joints_3d[:, 0] * W / image_size[0]
    mu_y = joints_3d[:, 1] * H / image_size[1]
    mu_z = (joints_3d[:, 2] / depth_bound + 0.5) * D

    weight = visible * (mu_z >= 0) * (mu_z < D)
    if joint_weights is not None:
        weight = weight * np.asarray(joint_weights, np.float32).reshape(-1)
    weight = weight.astype(np.float32)[:, None]

    tmp = 3 * sigma                  # kept float: non-integer for σ∉ℕ/3,
    offs = np.arange(2 * tmp + 1, dtype=np.float32) - tmp       # [L]
    target = np.zeros((num_joints, D, H, W), np.float32)
    for k in range(num_joints):
        xs = np.round(mu_x[k] + offs).clip(0, W - 1)
        ys = np.round(mu_y[k] + offs).clip(0, H - 1)
        zs = np.round(mu_z[k] + offs).clip(0, D - 1)
        gx = np.exp(-(xs - mu_x[k]) ** 2 / (2 * sigma ** 2))
        gy = np.exp(-(ys - mu_y[k]) ** 2 / (2 * sigma ** 2))
        gz = np.exp(-(zs - mu_z[k]) ** 2 / (2 * sigma ** 2))
        target[k, zs.astype(int)[:, None, None], ys.astype(int)[None, :,
               None], xs.astype(int)[None, None, :]] = (
            gz[:, None, None] * gy[None, :, None] * gx[None, None, :])
    return target * max_bound, weight


def generate_voxel_3d_targets(joints_3d, visible, space_size, space_center,
                              cube_size, sigma=200.0, joint_indices=None):
    """Per-joint 3D gaussian volumes over a metric voxel grid (reference
    pose3d_transform.py:559 `GenerateVoxel3DHeatmapTarget`; VoxelPose
    center/pose-net training targets).

    Args:
      joints_3d: [P, K, 3] per-person metric (mm) joints; visible [P, K]
        or [P, K, C] (first channel used).
      space_size/space_center/cube_size: the voxel grid spec, axes (x, y, z).
      sigma: gaussian width in mm.

    Returns [K', X, Y, Z] float32 clipped to [0, 1] — max over people; a
    single selected joint squeezes to [X, Y, Z] like the reference.
    """
    import numpy as np
    joints_3d = np.asarray(joints_3d, np.float32)
    visible = np.asarray(visible, np.float32)
    if visible.ndim == 3:
        visible = visible[..., 0]
    num_people, num_joints = joints_3d.shape[:2]
    idxs = list(range(num_joints)) if joint_indices is None \
        else list(joint_indices)
    grids = [np.linspace(-space_size[a] / 2, space_size[a] / 2,
                         cube_size[a]) + space_center[a] for a in range(3)]
    target = np.zeros((len(idxs),) + tuple(int(c) for c in cube_size),
                      np.float32)
    for n in range(num_people):
        for out_k, k in enumerate(idxs):
            if visible[n, k] < 1:
                continue
            mu = joints_3d[n, k]
            # only the voxels within 3σ of the joint (searchsorted windows,
            # empty when the joint is outside the grid)
            lo = [np.searchsorted(grids[a], mu[a] - 3 * sigma)
                  for a in range(3)]
            hi = [np.searchsorted(grids[a], mu[a] + 3 * sigma, 'right')
                  for a in range(3)]
            if any(lo[a] >= hi[a] for a in range(3)):
                continue
            gs = [np.exp(-(grids[a][lo[a]:hi[a]] - mu[a]) ** 2
                         / (2 * sigma ** 2)) for a in range(3)]
            g = (gs[0][:, None, None] * gs[1][None, :, None]
                 * gs[2][None, None, :])
            sl = (out_k, slice(lo[0], hi[0]), slice(lo[1], hi[1]),
                  slice(lo[2], hi[2]))
            target[sl] = np.maximum(target[sl], g)
    target = np.clip(target, 0, 1)
    if target.shape[0] == 1:
        target = target[0]
    return target

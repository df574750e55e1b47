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

"""Batched on-device affine warp (crop) — replaces per-sample host
cv2.warpAffine in the reference pipeline (top_down_transform.py:295
`TopDownAffine`).

cv2.warpAffine(img, M, (w, h), INTER_LINEAR) computes
``dst(x, y) = src(M^{-1} [x, y, 1])`` with bilinear interpolation and
constant-zero border. We do the same for a whole batch of images/boxes in one
XLA program: build the inverse map, gather the 4 neighbors, and blend.
Gathers vectorize on the VPU; the op fuses with normalization and target
generation inside the preprocessing jit.
"""
from __future__ import annotations

import jax.numpy as jnp

from .geometry import invert_affine


def warp_affine_batch(images, matrices, output_size):
    """Warp a batch of images with per-image affine matrices.

    Args:
      images: [N, H, W, C] float source images.
      matrices: [N, 2, 3] forward (dst <- src) affine matrices.
      output_size: static (out_w, out_h).

    Returns: [N, out_h, out_w, C] warped crops (zeros outside the source).
    """
    images = jnp.asarray(images)
    out_w, out_h = int(output_size[0]), int(output_size[1])
    n, h, w, c = images.shape

    inv = invert_affine(jnp.asarray(matrices, jnp.float32))  # [N, 2, 3]
    xs = jnp.arange(out_w, dtype=jnp.float32)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)                            # [out_h, out_w]

    # source coords per batch element: [N, out_h, out_w]
    sx = (inv[:, 0, 0, None, None] * gx + inv[:, 0, 1, None, None] * gy
          + inv[:, 0, 2, None, None])
    sy = (inv[:, 1, 0, None, None] * gx + inv[:, 1, 1, None, None] * gy
          + inv[:, 1, 2, None, None])

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def sample(xi, yi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        flat = images.reshape(n, h * w, c)
        idx = (yc * w + xc).reshape(n, -1)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        vals = vals.reshape(n, out_h, out_w, c)
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = sample(x0i, y0i)
    v01 = sample(x0i + 1, y0i)
    v10 = sample(x0i, y0i + 1)
    v11 = sample(x0i + 1, y0i + 1)

    wx = fx[..., None]
    wy = fy[..., None]
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy

"""Deformable convolution v1/v2 in pure XLA (gather-based).

The reference's PoseWarper neck depends on mmcv's compiled CUDA
DeformConv2d (reference mmpose/models/necks/posewarper_neck.py). On TPU a
deformable conv is a batched bilinear gather + weighted sum, which XLA
vectorizes on the VPU; no custom CUDA needed.

For each output pixel p and kernel tap k, the sample position is
p + k_offset + learned_offset[p, k]; values are bilinearly interpolated
(zeros outside), optionally modulated (v2), then contracted with the
kernel weights via one einsum (an MXU matmul over taps*channels).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def deform_conv2d(x, offsets, weight, mask=None, stride=1, padding=1,
                  dilation=1):
    """Deformable 2D convolution.

    Args:
      x: [N, H, W, C_in].
      offsets: [N, H_out, W_out, 2 * kh * kw] — per-tap (dy, dx) pairs,
        ordered tap-major like torchvision deform_conv2d.
      weight: [kh, kw, C_in, C_out].
      mask: optional [N, H_out, W_out, kh * kw] modulation (DCNv2).

    Returns: [N, H_out, W_out, C_out].
    """
    n, h, w, c_in = x.shape
    kh, kw, _, c_out = weight.shape
    h_out = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    w_out = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    # base sampling grid per output position and tap
    ys = jnp.arange(h_out) * stride - padding
    xs = jnp.arange(w_out) * stride - padding
    ky = jnp.arange(kh) * dilation
    kx = jnp.arange(kw) * dilation
    base_y = ys[:, None, None, None] + ky[None, None, :, None]  # [Ho,1,kh,1]
    base_x = xs[None, :, None, None] + kx[None, None, None, :]  # [1,Wo,1,kw]
    base_y = jnp.broadcast_to(base_y, (h_out, w_out, kh, kw))
    base_x = jnp.broadcast_to(base_x, (h_out, w_out, kh, kw))

    off = offsets.reshape(n, h_out, w_out, kh, kw, 2)
    sy = base_y[None] + off[..., 0]                   # [N,Ho,Wo,kh,kw]
    sx = base_x[None] + off[..., 1]

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy = sy - y0
    fx = sx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    flat = x.reshape(n, h * w, c_in)

    def sample(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        idx = (yc * w + xc).reshape(n, -1)
        v = jnp.take_along_axis(flat, idx[..., None], axis=1)
        v = v.reshape(n, h_out, w_out, kh, kw, c_in)
        return jnp.where(valid[..., None], v, 0.0)

    v00 = sample(y0i, x0i)
    v01 = sample(y0i, x0i + 1)
    v10 = sample(y0i + 1, x0i)
    v11 = sample(y0i + 1, x0i + 1)
    wy = fy[..., None]
    wx = fx[..., None]
    val = ((v00 * (1 - wy) * (1 - wx)) + (v01 * (1 - wy) * wx)
           + (v10 * wy * (1 - wx)) + (v11 * wy * wx))
    if mask is not None:
        val = val * mask.reshape(n, h_out, w_out, kh, kw, 1)

    # contraction over taps and input channels -> one MXU matmul
    return jnp.einsum('nhwijc,ijco->nhwo', val, weight,
                      preferred_element_type=jnp.float32).astype(x.dtype)

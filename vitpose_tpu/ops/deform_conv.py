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
                  dilation=1, deform_groups=1):
    """Deformable 2D convolution.

    Args:
      x: [N, H, W, C_in].
      offsets: [N, H_out, W_out, 2 * kh * kw * deform_groups] — per-tap
        (dy, dx) pairs, tap-major within each group, groups-major like
        mmcv DeformConv2d's offset layout.
      weight: [kh, kw, C_in, C_out].
      mask: optional [N, H_out, W_out, kh * kw] modulation (DCNv2).
      deform_groups: input channels are split into this many groups, each
        sampled with its own offset field (the reference PoseWarper neck
        uses one group PER JOINT, posewarper_neck.py:163 deform_groups);
        the kernel contraction itself stays dense.

    Returns: [N, H_out, W_out, C_out].
    """
    n, h, w, c_in = x.shape
    kh, kw, _, c_out = weight.shape
    if deform_groups > 1:
        g = deform_groups
        assert c_in % g == 0, (c_in, g)
        cg = c_in // g
        xg = x.reshape(n, h, w, g, cg).transpose(0, 3, 1, 2, 4) \
            .reshape(n * g, h, w, cg)
        ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
        wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
        og = offsets.reshape(n, ho, wo, g, 2 * kh * kw) \
            .transpose(0, 3, 1, 2, 4).reshape(n * g, ho, wo, 2 * kh * kw)
        val = _deform_sample(xg, og, kh, kw, stride, padding, dilation)
        val = val.reshape(n, g, ho, wo, kh, kw, cg) \
            .transpose(0, 2, 3, 4, 5, 1, 6) \
            .reshape(n, ho, wo, kh, kw, c_in)
        if mask is not None:
            val = val * mask.reshape(n, ho, wo, kh, kw, 1)
        return jnp.einsum('nhwijc,ijco->nhwo', val, weight,
                          preferred_element_type=jnp.float32).astype(x.dtype)
    val = _deform_sample(x, offsets, kh, kw, stride, padding, dilation)
    if mask is not None:
        h_out, w_out = val.shape[1], val.shape[2]
        val = val * mask.reshape(n, h_out, w_out, kh, kw, 1)

    # contraction over taps and input channels -> one MXU matmul
    return jnp.einsum('nhwijc,ijco->nhwo', val, weight,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def _deform_sample(x, offsets, kh, kw, stride, padding, dilation):
    """Bilinear tap sampling: [N, H, W, C] + per-tap offsets ->
    [N, H_out, W_out, kh, kw, C]."""
    n, h, w, c_in = x.shape
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
    return ((v00 * (1 - wy) * (1 - wx)) + (v01 * (1 - wy) * wx)
            + (v10 * wy * (1 - wx)) + (v11 * wy * wx))

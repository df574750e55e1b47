"""Deformable conv correctness + PoseWarper neck tests."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vitpose_tpu.ops.deform_conv import deform_conv2d


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

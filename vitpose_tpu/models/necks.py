"""Necks: GlobalAveragePooling and PoseWarper temporal aggregation.

Counterparts of reference mmpose/models/necks/:
  * GlobalAveragePooling (gap_neck.py) — trivial spatial mean.
  * PoseWarperNeck (posewarper_neck.py, 329 LoC + mmcv DCN CUDA op):
    aligns per-frame features to the key frame with offset fields predicted
    from feature differences, applies multi-dilation deformable convolution
    (ops/deform_conv.py — pure XLA, no CUDA), and sums across frames.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.deform_conv import deform_conv2d
from .resnet import _bn


class GlobalAveragePooling(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return jnp.mean(x, axis=(1, 2))


class PoseWarperNeck(nn.Module):
    """Warp supporting-frame features onto the key frame and aggregate.

    Inputs: key [N, H, W, C], supports [N, T, H, W, C].
    Output: [N, H, W, out_channels] aggregated feature.
    """
    out_channels: int = 48
    kernel: int = 3
    dilations: Sequence[int] = (3, 6, 12, 18, 24)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, key, supports, train: bool = False,
                 frame_weight=None):
        # frame_weight: optional [T] per-frame aggregation weights
        # (reference posewarper_neck.py:283-318 multiplies each warped
        # feature by frame_weight[i]); None -> uniform mean over T.
        n, t, h, w, c = supports.shape
        k = self.kernel
        key_p = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, name='reduce_key')(key)
        key_p = _bn(train, self.dtype, 'reduce_key_bn')(key_p)

        # one deformable kernel PER DILATION (reference
        # posewarper_neck.py:185-196 builds a separate DeformConv2d per
        # dilation; sharing one kernel would collapse the multi-dilation
        # aggregation), identity-initialized like the reference
        # init_weights (center-tap eye, posewarper_neck.py:221-230);
        # modules are instantiated once and re-applied per frame (weight
        # sharing across T only)
        def _identity_dcn(rng, shape, dtype=self.dtype):
            kk = shape[0]
            eye = jnp.eye(shape[2], shape[3], dtype=dtype)
            w0 = jnp.zeros(shape, dtype)
            return w0.at[kk // 2, kk // 2].set(eye)

        weights = [
            self.param(f'dcn_weight_d{di}', _identity_dcn,
                       (k, k, self.out_channels, self.out_channels))
            for di in range(len(self.dilations))]
        reduce_sup = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                             dtype=self.dtype, name='reduce_sup')
        sup_bn = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, dtype=self.dtype,
                              name='reduce_sup_bn')
        offset_convs = [
            nn.Conv(2 * k * k, (3, 3), padding=((dil, dil), (dil, dil)),
                    kernel_dilation=(dil, dil), dtype=self.dtype,
                    name=f'offset_d{di}')
            for di, dil in enumerate(self.dilations)]

        if frame_weight is None:
            fw = jnp.full((t,), 1.0 / t, self.dtype)
        else:
            fw = jnp.asarray(frame_weight, self.dtype)
        agg = None
        for ti in range(t):
            sup_p = sup_bn(reduce_sup(supports[:, ti]))
            diff = key_p - sup_p
            warped = None
            for oc, wt, dil in zip(offset_convs, weights, self.dilations):
                off = oc(diff)
                out = deform_conv2d(sup_p, off, wt, padding=dil,
                                    dilation=dil)
                warped = out if warped is None else warped + out
            warped = warped / len(self.dilations)
            warped = warped * fw[ti]
            agg = warped if agg is None else agg + warped
        return agg

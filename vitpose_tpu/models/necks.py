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


class GlobalAveragePooling(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return jnp.mean(x, axis=(1, 2))


class PoseWarperNeck(nn.Module):
    """Warp supporting-frame features onto the key frame and aggregate
    (reference posewarper_neck.py:24 `PoseWarperNeck`, faithful layout):

      * a SHARED ``trans_layer`` 1x1 conv (with bias) maps every frame's
        backbone feature to ``out_channels`` (``trans_conv_kernel=0`` for
        identity, 1/3 for conv — reference posewarper_neck.py:100-119);
      * ``offset_feats`` — a chain of ``num_blocks`` BasicBlocks (first
        one projecting ``out_channels -> inner_channels`` with a 1x1
        downsample skip) over the key-minus-support feature difference
        (reference :121-153);
      * one offset conv (no bias) + one deformable conv (no bias) PER
        DILATION; the per-dilation warps are averaged, then frames are
        summed with ``frame_weight`` (reference :155-201, :283-318).

    Inputs: key [N, H, W, C], supports [N, T, H, W, C] (all frames,
    key included, like the reference's ``inputs`` list). Output:
    [N, H, W, out_channels].

    TPU-first: frames fold into the batch axis, so the 20-block offset
    chain, the offset convs, and the deformable warp each run as ONE
    batched pass over [N*T, ...] instead of a per-frame Python loop.
    """
    out_channels: int = 48
    inner_channels: int = 128
    kernel: int = 3                       # deform conv kernel
    offsets_kernel: int = 3
    num_blocks: int = 20
    trans_conv_kernel: int = 1
    # one offset field per channel group — the reference warps each JOINT
    # heatmap channel with its own offsets (posewarper_neck.py:163,
    # config deform_groups=17); 0 means one group per output channel
    deform_groups: int = 0
    dilations: Sequence[int] = (3, 6, 12, 18, 24)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, key, supports, train: bool = False,
                 frame_weight=None):
        from .resnet import BasicBlock
        n, t, h, w, c = supports.shape
        k = self.kernel

        if self.trans_conv_kernel > 0:
            tk = self.trans_conv_kernel
            pad = (tk - 1) // 2
            trans = nn.Conv(self.out_channels, (tk, tk),
                            padding=((pad, pad), (pad, pad)),
                            dtype=self.dtype, name='trans_layer')
        else:
            trans = lambda x: x           # noqa: E731
        key_p = trans(key)
        sup_p = trans(supports.reshape(n * t, h, w, c))
        co = sup_p.shape[-1]

        # offset features on the key-minus-support difference, one batched
        # pass over all frames
        diff = (jnp.repeat(key_p, t, axis=0) - sup_p)
        diff = BasicBlock(self.inner_channels,
                          downsample=co != self.inner_channels,
                          dtype=self.dtype, name='offset_feats_0')(
                              diff, train=train)
        for bi in range(1, self.num_blocks):
            diff = BasicBlock(self.inner_channels, dtype=self.dtype,
                              name=f'offset_feats_{bi}')(diff, train=train)

        # identity init for the deformable kernels (center-tap eye,
        # reference init_weights posewarper_neck.py:221-230)
        def _identity_dcn(rng, shape, dtype=self.dtype):
            kk = shape[0]
            eye = jnp.eye(shape[2], shape[3], dtype=dtype)
            w0 = jnp.zeros(shape, dtype)
            return w0.at[kk // 2, kk // 2].set(eye)

        if frame_weight is None:
            fw = jnp.full((t,), 1.0 / t, self.dtype)
        else:
            fw = jnp.asarray(frame_weight, self.dtype)

        ok = self.offsets_kernel
        opad = (ok - 1) // 2
        groups = self.deform_groups or co
        warped = None
        for di, dil in enumerate(self.dilations):
            # zero-initialized offsets (reference constant_init(.., 0),
            # posewarper_neck.py:236): with the identity DCN kernels the
            # whole neck starts as an exact identity warp
            off = nn.Conv(2 * ok * ok * groups, (ok, ok),
                          padding=((opad * dil,) * 2, (opad * dil,) * 2),
                          kernel_dilation=(dil, dil), use_bias=False,
                          kernel_init=nn.initializers.zeros,
                          dtype=self.dtype,
                          name=f'offset_layers_{di}')(diff)
            wt = self.param(f'deform_conv_{di}', _identity_dcn,
                            (k, k, co, co))
            out = deform_conv2d(sup_p, off, wt, padding=(k // 2) * dil,
                                dilation=dil, deform_groups=groups)
            warped = out if warped is None else warped + out
        warped = warped / len(self.dilations)
        warped = warped.reshape(n, t, h, w, co)
        return jnp.einsum('t,nthwc->nhwc', fw, warped)

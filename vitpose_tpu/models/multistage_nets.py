"""Multi-stage pose backbones: MSPN, RSN, LiteHRNet.

Counterparts of reference mmpose/models/backbones/{mspn,rsn,litehrnet}.py:
  * MSPN: stacked single-stage U-nets (ResNet-ish down, upsample+skip up)
    with cross-stage feature aggregation; returns per-stage multi-scale
    feature lists for MSMU-style heads.
  * RSN: same topology with Residual Steps Blocks (dense intra-block
    element-wise connectivity) in the downsample path.
  * LiteHRNet: HRNet topology with conditional-channel-weighting blocks
    instead of heavy residual units.
Compact NHWC flax implementations preserving the architectural semantics
(stage counts, resolutions, fusion patterns), not weight-compatible layouts.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import BasicBlock, _bn


def _conv_bn(x, train, out_ch, k, name, stride=1, act=True,
             dtype=jnp.float32):
    """mmcv ConvModule: conv (no bias, BN) + optional ReLU."""
    p = k // 2
    x = nn.Conv(out_ch, (k, k), strides=(stride, stride),
                padding=((p, p), (p, p)), use_bias=False, dtype=dtype,
                name=f'{name}_conv')(x)
    x = _bn(train, dtype, f'{name}_bn')(x)
    return nn.relu(x) if act else x


def _bilinear_ac_matrix(n_in, n_out):
    """[n_out, n_in] align_corners=True linear-interpolation matrix
    (torch F.interpolate(..., mode='bilinear', align_corners=True))."""
    import numpy as np
    m = np.zeros((n_out, n_in), np.float32)
    if n_in == 1 or n_out == 1:
        m[:, 0] = 1.0
        return m
    src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = np.floor(src).astype(int)
    hi = np.minimum(lo + 1, n_in - 1)
    w = (src - lo).astype(np.float32)
    m[np.arange(n_out), lo] += 1.0 - w
    m[np.arange(n_out), hi] += w
    return m


def resize_bilinear_ac(x, out_hw):
    """NHWC align-corners bilinear resize as two small matmuls (MXU-
    friendly, exact vs torch align_corners=True)."""
    h, w = out_hw
    mh = jnp.asarray(_bilinear_ac_matrix(x.shape[1], h))
    mw = jnp.asarray(_bilinear_ac_matrix(x.shape[2], w))
    return jnp.einsum('hH,nHWc,wW->nhwc', mh, x, mw)


class RSB(nn.Module):
    """Residual Steps Block (reference rsn.py:12): the input is expanded
    to num_steps branches; branch i applies i+1 3x3 convs where step j also
    receives branch (i-1)'s step-j output (dense element-wise feeds)."""
    out_ch: int
    stride: int = 1
    downsample: bool = False
    num_steps: int = 4
    expand_times: int = 26
    res_top_channels: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        branch = x.shape[-1] * self.expand_times // self.res_top_channels
        y = _conv_bn(x, train, self.num_steps * branch, 1, 'conv_bn_relu1',
                     stride=self.stride, dtype=self.dtype)
        spx = jnp.split(y, self.num_steps, axis=-1)
        outputs = []
        outs = []
        for i in range(self.num_steps):
            outputs.append([])
            for j in range(i + 1):
                inp = spx[i] if j == 0 else outputs[i][j - 1]
                if i > j:
                    inp = inp + outputs[i - 1][j]
                outputs[i].append(_conv_bn(
                    inp, train, branch, 3, f'conv_bn_relu2_{i + 1}_{j + 1}',
                    dtype=self.dtype))
            outs.append(outputs[i][i])
        y = jnp.concatenate(outs, axis=-1)
        y = _conv_bn(y, train, self.out_ch, 1, 'conv_bn3', act=False,
                     dtype=self.dtype)
        if self.downsample:
            identity = _conv_bn(x, train, self.out_ch, 1, 'downsample',
                                stride=self.stride, act=False,
                                dtype=self.dtype)
        return nn.relu(y + identity)


class _DownsampleModule(nn.Module):
    """MSPN/RSN downsample trunk (reference mspn.py:36 / rsn.py:125):
    num_units ResNet layers; unit i output optionally adds the prior
    stage's skip features; returns the pyramid LOWEST-resolution first."""
    num_blocks: Sequence[int] = (2, 2, 2, 2)
    has_skip: bool = False
    use_rsb: bool = False
    num_steps: int = 4
    expand_times: int = 26
    in_channels: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip1, skip2, train=False):
        from .resnet import Bottleneck
        outs = []
        in_ch = self.in_channels
        for i, nb in enumerate(self.num_blocks):
            planes = self.in_channels * (2 ** i)
            stride = 1 if i == 0 else 2
            for b in range(nb):
                s = stride if b == 0 else 1
                if self.use_rsb:
                    ds = b == 0 and (s != 1 or in_ch != planes)
                    x = RSB(planes, stride=s, downsample=ds,
                            num_steps=self.num_steps,
                            expand_times=self.expand_times,
                            res_top_channels=self.in_channels,
                            dtype=self.dtype,
                            name=f'layer{i + 1}_{b}')(x, train=train)
                    in_ch = planes
                else:
                    ds = b == 0 and (s != 1 or in_ch != planes * 4)
                    x = Bottleneck(planes, stride=s, downsample=ds,
                                   dtype=self.dtype,
                                   name=f'layer{i + 1}_{b}')(x, train=train)
                    in_ch = planes * 4
            if self.has_skip:
                x = x + skip1[i] + skip2[i]
            outs.append(x)
        return outs[::-1]                 # lowest resolution first


class _UpsampleUnit(nn.Module):
    """reference mspn.py:115 Upsample_unit."""
    ind: int
    num_units: int
    unit_channels: int = 256
    gen_skip: bool = False
    gen_cross_conv: bool = False
    out_channels: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, up_x, train=False):
        out = _conv_bn(x, train, self.unit_channels, 1, 'in_skip',
                       act=False, dtype=self.dtype)
        if self.ind > 0:
            up = resize_bilinear_ac(up_x, (x.shape[1], x.shape[2]))
            up = _conv_bn(up, train, self.unit_channels, 1, 'up_conv',
                          act=False, dtype=self.dtype)
            out = out + up
        out = nn.relu(out)
        skip1 = skip2 = cross = None
        if self.gen_skip:
            skip1 = _conv_bn(x, train, x.shape[-1], 1, 'out_skip1',
                             dtype=self.dtype)
            skip2 = _conv_bn(out, train, x.shape[-1], 1, 'out_skip2',
                             dtype=self.dtype)
        if self.ind == self.num_units - 1 and self.gen_cross_conv:
            cross = _conv_bn(out, train, self.out_channels, 1, 'cross_conv',
                             dtype=self.dtype)
        return out, skip1, skip2, cross


class _SingleStage(nn.Module):
    """One MSPN/RSN hourglass: downsample + upsample with skip gen."""
    has_skip: bool = False
    gen_skip: bool = False
    gen_cross_conv: bool = False
    unit_channels: int = 256
    num_blocks: Sequence[int] = (2, 2, 2, 2)
    use_rsb: bool = False
    num_steps: int = 4
    expand_times: int = 26
    in_channels: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip1, skip2, train=False):
        n = len(self.num_blocks)
        mid = _DownsampleModule(self.num_blocks, self.has_skip,
                                self.use_rsb, self.num_steps,
                                self.expand_times, self.in_channels,
                                dtype=self.dtype,
                                name='downsample')(x, skip1, skip2,
                                                   train=train)
        outs, s1, s2 = [], [], []
        cross = None
        for i in range(n):
            out_i, s1_i, s2_i, cr = _UpsampleUnit(
                i, n, self.unit_channels, self.gen_skip,
                self.gen_cross_conv, self.in_channels, dtype=self.dtype,
                name=f'up{i + 1}')(mid[i], outs[i - 1] if i else None,
                                   train=train)
            outs.append(out_i)
            s1.append(s1_i)
            s2.append(s2_i)
            if cr is not None:
                cross = cr
        return outs, s1[::-1], s2[::-1], cross


class MSPN(nn.Module):
    """Multi-Stage Pose Network (reference mspn.py:385): returns a list
    over stages of per-unit features, LOWEST resolution first (matching the
    reference; MSMU heads supervise all units)."""
    num_stages: int = 2
    num_units: int = 4
    num_blocks: Sequence[int] = (2, 2, 2, 2)
    unit_channels: int = 256
    res_top_channels: int = 64
    use_rsb: bool = False                 # True => RSN
    num_steps: int = 4
    expand_times: int = 26
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv_bn(x, train, self.res_top_channels, 7, 'top', stride=2,
                     dtype=self.dtype)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        out_feats = []
        skip1 = skip2 = None
        for st in range(self.num_stages):
            last = st == self.num_stages - 1
            outs, skip1, skip2, x2 = _SingleStage(
                has_skip=st > 0, gen_skip=not last,
                gen_cross_conv=not last, unit_channels=self.unit_channels,
                num_blocks=self.num_blocks[:self.num_units],
                use_rsb=self.use_rsb, num_steps=self.num_steps,
                expand_times=self.expand_times,
                in_channels=self.res_top_channels, dtype=self.dtype,
                name=f'stage{st}')(x, skip1, skip2, train=train)
            out_feats.append(outs)
            if not last:
                x = x2
        return out_feats


def RSN(num_stages=2, unit_channels=256, num_units=4,
        num_blocks=(2, 2, 2, 2), num_steps=4, expand_times=26,
        dtype=jnp.float32):
    """RSN = MSPN topology with Residual Steps Blocks (reference rsn.py)."""
    return MSPN(num_stages=num_stages, num_units=num_units,
                num_blocks=num_blocks, unit_channels=unit_channels,
                use_rsb=True, num_steps=num_steps,
                expand_times=expand_times, dtype=dtype)


class CCWBlock(nn.Module):
    """LiteHRNet conditional channel weighting: cheap cross-resolution
    channel attention replacing per-branch residual convs."""
    channels: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train=False):
        # cross-resolution weighting from pooled concat
        pooled = [jnp.mean(x, axis=(1, 2)) for x in xs]     # [N, C_i]
        cat = jnp.concatenate(pooled, axis=-1)
        total = cat.shape[-1]
        z = nn.relu(nn.Dense(max(total // 8, 4), dtype=self.dtype,
                             name='fc1')(cat))
        gates = nn.sigmoid(nn.Dense(total, dtype=self.dtype,
                                    name='fc2')(z))
        outs = []
        off = 0
        for bi, x in enumerate(xs):
            c = x.shape[-1]
            g = gates[:, off:off + c][:, None, None, :]
            off += c
            y = x * g
            # depthwise 3x3 + pointwise (shuffle-style cheap conv)
            y = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)),
                        feature_group_count=c, use_bias=False,
                        dtype=self.dtype, name=f'dw{bi}')(y)
            y = _bn(train, self.dtype, f'dw{bi}_bn')(y)
            y = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f'pw{bi}')(y)
            y = nn.relu(_bn(train, self.dtype, f'pw{bi}_bn')(y))
            outs.append(x + y)
        return outs


class LiteHRNet(nn.Module):
    """Lightweight HRNet: stem -> parallel branches with CCW blocks and
    HRNet-style fusion; returns the high-resolution branch."""
    width: int = 18
    stage_modules: Sequence[int] = (1, 2, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .hrnet import ExchangeModule
        w = self.width
        chans = (w, w * 2, w * 4, w * 8)
        for i in (1, 2):
            x = nn.Conv(32, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=self.dtype,
                        name=f'stem{i}')(x)
            x = nn.relu(_bn(train, self.dtype, f'stem{i}_bn')(x))
        b0 = nn.Conv(chans[0], (1, 1), use_bias=False, dtype=self.dtype,
                     name='tr0')(x)
        b1 = nn.Conv(chans[1], (3, 3), strides=(2, 2),
                     padding=((1, 1), (1, 1)), use_bias=False,
                     dtype=self.dtype, name='tr1')(x)
        xs = [nn.relu(_bn(train, self.dtype, 'tr0_bn')(b0)),
              nn.relu(_bn(train, self.dtype, 'tr1_bn')(b1))]
        for stage, n_mod in enumerate(self.stage_modules):
            n_br = stage + 2
            for m in range(n_mod):
                xs = CCWBlock(chans[:n_br], dtype=self.dtype,
                              name=f's{stage}_ccw{m}')(xs, train=train)
            # HRNet-style fusion at the end of each stage
            xs = ExchangeModule(chans[:n_br], num_blocks=0,
                                dtype=self.dtype,
                                name=f's{stage}_fuse')(xs, train=train)
            if stage < len(self.stage_modules) - 1:
                y = nn.Conv(chans[n_br], (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), use_bias=False,
                            dtype=self.dtype, name=f'tr{stage + 2}')(xs[-1])
                xs = xs + [nn.relu(_bn(train, self.dtype,
                                       f'tr{stage + 2}_bn')(y))]
        return xs[0]

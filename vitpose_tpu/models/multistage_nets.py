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
(stage counts, resolutions, fusion patterns). Reference .pth checkpoints
convert via utils/cnn_ckpt.py with conversion-parity goldens
(tests/test_cnn_parity.py).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

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
    friendly, exact vs torch align_corners=True). HIGHEST precision: the
    TPU default multiplies f32 in bf16, visibly denting subpixel decode."""
    import jax
    h, w = out_hw
    mh = jnp.asarray(_bilinear_ac_matrix(x.shape[1], h))
    mw = jnp.asarray(_bilinear_ac_matrix(x.shape[2], w))
    return jnp.einsum('hH,nHWc,wW->nhwc', mh, x, mw,
                      precision=jax.lax.Precision.HIGHEST)


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


def _channel_shuffle(x, groups=2):
    """NHWC channel shuffle (reference utils/channel_shuffle.py)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, groups, c // groups)
    x = x.transpose(0, 1, 2, 4, 3)
    return x.reshape(n, h, w, c)


def _adaptive_avg_pool(x, out_hw):
    """Exact adaptive average pool for integer-ratio downsizes."""
    n, h, w, c = x.shape
    th, tw = out_hw
    assert h % th == 0 and w % tw == 0, (h, w, th, tw)
    x = x.reshape(n, th, h // th, tw, w // tw, c)
    return x.mean(axis=(2, 4))


class SpatialWeighting(nn.Module):
    """SE-style gating (reference litehrnet.py:21): avgpool -> 1x1 ReLU ->
    1x1 Sigmoid."""
    ratio: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))
        s = nn.relu(nn.Dense(int(c / self.ratio), dtype=self.dtype,
                             name='fc1')(s))
        s = nn.sigmoid(nn.Dense(c, dtype=self.dtype, name='fc2')(s))
        return x * s[:, None, None, :]


class CrossResolutionWeighting(nn.Module):
    """reference litehrnet.py:72: pool all branches to the smallest
    resolution, 1x1 ReLU -> 1x1 Sigmoid over the concat, split and gate
    each branch (nearest-upsampled)."""
    channels: Sequence[int]
    ratio: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train=False):
        mini = xs[-1].shape[1:3]
        pooled = [_adaptive_avg_pool(s, mini) for s in xs[:-1]] + [xs[-1]]
        out = jnp.concatenate(pooled, axis=-1)
        total = out.shape[-1]
        # CCW passes norm_cfg=BN, so both ConvModules are conv+BN+act
        out = nn.Conv(int(total / self.ratio), (1, 1), use_bias=False,
                      dtype=self.dtype, name='conv1')(out)
        out = nn.relu(_bn(train, self.dtype, 'conv1_bn')(out))
        out = nn.Conv(total, (1, 1), use_bias=False, dtype=self.dtype,
                      name='conv2')(out)
        out = nn.sigmoid(_bn(train, self.dtype, 'conv2_bn')(out))
        gates = jnp.split(out, np.cumsum(self.channels)[:-1].tolist(),
                          axis=-1)
        outs = []
        for s, a in zip(xs, gates):
            a = jax.image.resize(a, (a.shape[0],) + s.shape[1:3]
                                 + (a.shape[-1],), method='nearest')
            outs.append(s * a)
        return outs


class ConditionalChannelWeighting(nn.Module):
    """reference litehrnet.py:132: split channels; the second half goes
    through cross-resolution weighting, per-branch depthwise conv and
    spatial weighting; concat + channel shuffle."""
    in_channels: Sequence[int]
    reduce_ratio: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train=False):
        halves = [c // 2 for c in self.in_channels]
        x1 = [s[..., :h] for s, h in zip(xs, halves)]
        x2 = [s[..., h:] for s, h in zip(xs, halves)]
        x2 = CrossResolutionWeighting(halves, self.reduce_ratio,
                                      dtype=self.dtype,
                                      name='crw')(x2, train=train)
        outs = []
        for b, s in enumerate(x2):
            ch = halves[b]
            s = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                        feature_group_count=ch, use_bias=False,
                        dtype=self.dtype, name=f'dw{b}')(s)
            s = _bn(train, self.dtype, f'dw{b}_bn')(s)
            s = SpatialWeighting(ratio=4, dtype=self.dtype,
                                 name=f'sw{b}')(s)
            outs.append(s)
        return [_channel_shuffle(jnp.concatenate([a, b], axis=-1))
                for a, b in zip(x1, outs)]


class LiteHRNetStem(nn.Module):
    """reference litehrnet.py:208 Stem: conv s2 then a ShuffleNetV2-style
    split block with another /2."""
    stem_channels: int = 32
    out_channels: int = 32
    expand_ratio: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.stem_channels, (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name='conv1')(x)
        x = nn.relu(_bn(train, self.dtype, 'conv1_bn')(x))
        half = self.stem_channels // 2
        mid = int(round(self.stem_channels * self.expand_ratio))
        inc = (self.out_channels - half
               if self.stem_channels == self.out_channels
               else self.out_channels - self.stem_channels)
        lin_out = (half if self.stem_channels == self.out_channels
                   else self.stem_channels)
        x1, x2 = x[..., :half], x[..., half:]
        b1 = nn.Conv(half, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                     feature_group_count=half, use_bias=False,
                     dtype=self.dtype, name='b1_dw')(x1)
        b1 = _bn(train, self.dtype, 'b1_dw_bn')(b1)
        b1 = nn.Conv(inc, (1, 1), use_bias=False, dtype=self.dtype,
                     name='b1_pw')(b1)
        b1 = nn.relu(_bn(train, self.dtype, 'b1_pw_bn')(b1))
        y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                    name='expand')(x2)
        y = nn.relu(_bn(train, self.dtype, 'expand_bn')(y))
        y = nn.Conv(mid, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    feature_group_count=mid, use_bias=False,
                    dtype=self.dtype, name='dw')(y)
        y = _bn(train, self.dtype, 'dw_bn')(y)
        y = nn.Conv(lin_out, (1, 1), use_bias=False, dtype=self.dtype,
                    name='linear')(y)
        y = nn.relu(_bn(train, self.dtype, 'linear_bn')(y))
        return _channel_shuffle(jnp.concatenate([b1, y], axis=-1))


class LiteFuse(nn.Module):
    """LiteHRModule fuse (reference litehrnet.py:629): dw-separable
    downsample chains, 1x1+bn+nearest up."""
    channels: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train=False):
        n_br = len(xs)
        fused = []
        # reference quirks (litehrnet.py:720-729): (1) branch 0's
        # contribution seeds y AND is added again in the loop (counted
        # twice); (2) for i == 0 that seed ALIASES out[0] and `y +=`
        # mutates it in place, so every later i consumes the PRE-RELU
        # fused sum of branch 0, not the original branch-0 features.
        xs = list(xs)
        for i in range(n_br):
            contribs = []
            for j in range(n_br):
                y = xs[j]
                if j > i:
                    y = nn.Conv(self.channels[i], (1, 1), use_bias=False,
                                dtype=self.dtype,
                                name=f'fuse{i}_{j}_conv')(y)
                    y = _bn(train, self.dtype, f'fuse{i}_{j}_bn')(y)
                    th, tw = xs[i].shape[1:3]
                    y = jax.image.resize(y, (y.shape[0], th, tw,
                                             y.shape[-1]), method='nearest')
                elif j < i:
                    for k in range(i - j):
                        last = k == i - j - 1
                        cj = self.channels[j]
                        co = self.channels[i] if last else cj
                        y = nn.Conv(cj, (3, 3), strides=(2, 2),
                                    padding=((1, 1), (1, 1)),
                                    feature_group_count=cj, use_bias=False,
                                    dtype=self.dtype,
                                    name=f'fuse{i}_{j}_d{k}_dw')(y)
                        y = _bn(train, self.dtype,
                                f'fuse{i}_{j}_d{k}_dwbn')(y)
                        y = nn.Conv(co, (1, 1), use_bias=False,
                                    dtype=self.dtype,
                                    name=f'fuse{i}_{j}_d{k}_pw')(y)
                        y = _bn(train, self.dtype,
                                f'fuse{i}_{j}_d{k}_pwbn')(y)
                        if not last:
                            y = nn.relu(y)
                contribs.append(y)
            acc = contribs[0] + sum(contribs)
            if i == 0:
                xs[0] = acc                # in-place mutation of out[0]
            fused.append(nn.relu(acc))
        return fused


class LiteHRNet(nn.Module):
    """Lite-HRNet (reference litehrnet.py:738): shuffle stem, staged
    conditional-channel-weighting modules with dw-separable transitions and
    fusion; returns the high-resolution branch."""
    stem_channels: int = 32
    stem_out_channels: int = 32
    expand_ratio: int = 1
    num_modules: Sequence[int] = (2, 4, 2)
    num_blocks: Sequence[int] = (2, 2, 2)
    reduce_ratios: Sequence[int] = (8, 8, 8)
    stage_channels: Sequence[Sequence[int]] = ((40, 80), (40, 80, 160),
                                               (40, 80, 160, 320))
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = LiteHRNetStem(self.stem_channels, self.stem_out_channels,
                          self.expand_ratio, dtype=self.dtype,
                          name='stem')(x, train=train)
        ys = [x]
        prev_ch = [self.stem_out_channels]
        for si in range(len(self.num_modules)):
            cur_ch = list(self.stage_channels[si])
            xs = []
            for b, c in enumerate(cur_ch):
                if b < len(prev_ch):
                    if c != prev_ch[b]:
                        y = nn.Conv(prev_ch[b], (3, 3),
                                    padding=((1, 1), (1, 1)),
                                    feature_group_count=prev_ch[b],
                                    use_bias=False, dtype=self.dtype,
                                    name=f'tr{si}_{b}_dw')(ys[b])
                        y = _bn(train, self.dtype, f'tr{si}_{b}_dwbn')(y)
                        y = nn.Conv(c, (1, 1), use_bias=False,
                                    dtype=self.dtype,
                                    name=f'tr{si}_{b}_pw')(y)
                        y = nn.relu(_bn(train, self.dtype,
                                        f'tr{si}_{b}_pwbn')(y))
                        xs.append(y)
                    else:
                        xs.append(ys[b])
                else:
                    y = ys[-1]
                    for k in range(b + 1 - len(prev_ch)):
                        cin = prev_ch[-1]
                        cout = c if k == b - len(prev_ch) else cin
                        y = nn.Conv(cin, (3, 3), strides=(2, 2),
                                    padding=((1, 1), (1, 1)),
                                    feature_group_count=cin, use_bias=False,
                                    dtype=self.dtype,
                                    name=f'tr{si}_{b}_c{k}_dw')(y)
                        y = _bn(train, self.dtype,
                                f'tr{si}_{b}_c{k}_dwbn')(y)
                        y = nn.Conv(cout, (1, 1), use_bias=False,
                                    dtype=self.dtype,
                                    name=f'tr{si}_{b}_c{k}_pw')(y)
                        y = nn.relu(_bn(train, self.dtype,
                                        f'tr{si}_{b}_c{k}_pwbn')(y))
                    xs.append(y)
            for m in range(self.num_modules[si]):
                for k in range(self.num_blocks[si]):
                    xs = ConditionalChannelWeighting(
                        cur_ch, self.reduce_ratios[si], dtype=self.dtype,
                        name=f'stage{si}_m{m}_blk{k}')(xs, train=train)
                xs = LiteFuse(cur_ch, dtype=self.dtype,
                              name=f'stage{si}_m{m}_fuse')(xs, train=train)
            ys = xs
            prev_ch = cur_ch
        return ys[0]

"""Remaining CNN backbone families: SCNet, ResNeSt, RegNet, MobileNetV3,
ShuffleNetV1.

Counterparts of reference mmpose/models/backbones/{scnet,resnest,regnet,
mobilenet_v3,shufflenet_v1}.py — compact NHWC flax implementations
preserving each family's defining block (self-calibrated conv,
split-attention, group-width bottleneck, SE+h-swish inverted residual,
grouped-1x1 shuffle unit).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import RESNET_SPECS, _bn


def _hswish(x):
    return x * nn.relu6(x + 3.0) / 6.0


class SCConv(nn.Module):
    """Self-calibrated conv (SCNet): branch A calibrates branch B through a
    downsampled gating path."""
    channels: int
    stride: int = 1
    pooling_r: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        # calibration path: avgpool -> conv -> nearest upsample -> sigmoid
        # gate at FULL resolution; the stride lives in k4 (reference
        # scnet.py:41-75: k2 pooled, k3 stride 1, k4 stride=stride + relu).
        # (pool size clamped so tiny feature maps don't collapse to zero)
        r = max(1, min(self.pooling_r, x.shape[1], x.shape[2]))
        down = nn.avg_pool(x, (r, r), strides=(r, r))
        down = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                       use_bias=False, dtype=self.dtype, name='k2')(down)
        down = _bn(train, self.dtype, 'k2_bn')(down)
        up = jax.image.resize(down, x.shape[:3] + (self.channels,),
                              method='nearest')
        gate = nn.sigmoid(x + up)
        y = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name='k3')(x)
        y = _bn(train, self.dtype, 'k3_bn')(y)
        y = y * gate
        y = nn.Conv(self.channels, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name='k4')(y)
        return nn.relu(_bn(train, self.dtype, 'k4_bn')(y))


class SCBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        half = self.planes // 2
        # branch a: plain conv path
        a = nn.relu(_bn(train, self.dtype, 'a1_bn')(
            nn.Conv(half, (1, 1), use_bias=False, dtype=self.dtype,
                    name='a1')(x)))
        a = nn.relu(_bn(train, self.dtype, 'a2_bn')(
            nn.Conv(half, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name='a2')(a)))
        # branch b: self-calibrated path (relu lives inside SCConv's k4)
        b = nn.relu(_bn(train, self.dtype, 'b1_bn')(
            nn.Conv(half, (1, 1), use_bias=False, dtype=self.dtype,
                    name='b1')(x)))
        b = SCConv(half, stride=self.stride, dtype=self.dtype,
                   name='scconv')(b, train=train)
        y = jnp.concatenate([a, b], axis=-1)
        y = _bn(train, self.dtype, 'out_bn')(
            nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name='out')(y))
        if self.downsample:
            identity = _bn(train, self.dtype, 'ds_bn')(
                nn.Conv(self.planes * 4, (1, 1),
                        strides=(self.stride,) * 2, use_bias=False,
                        dtype=self.dtype, name='ds')(x))
        return nn.relu(y + identity)


class ContextBlock(nn.Module):
    """GCNet global-context block (mmcv context_block.py, used by
    ViPNAS_Bottleneck attention): attention-pooled context + channel-add
    bottleneck with LayerNorm."""
    ratio: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        planes = int(c * self.ratio)
        mask = nn.Conv(1, (1, 1), dtype=self.dtype, name='conv_mask')(x)
        mask = jax.nn.softmax(mask.reshape(n, h * w, 1), axis=1)
        ctx = jnp.einsum('npc,np->nc', x.reshape(n, h * w, c),
                         mask[..., 0])
        y = nn.Dense(planes, dtype=self.dtype, name='add_fc1')(ctx)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='add_ln')(y)
        y = nn.relu(y)
        y = nn.Dense(c, dtype=self.dtype, name='add_fc2')(y)
        return x + y[:, None, None, :]


class ViPNASBottleneck(nn.Module):
    """ViPNAS_Bottleneck (reference vipnas_resnet.py:14): searched conv2
    kernel/groups + optional GCNet attention; expansion 1 by default."""
    out_ch: int
    expansion: int = 1
    stride: int = 1
    downsample: bool = False
    kernel_size: int = 3
    groups: int = 1
    attention: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        mid = self.out_ch // self.expansion
        k = self.kernel_size
        y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                    name='conv1')(x)
        y = nn.relu(_bn(train, self.dtype, 'bn1')(y))
        y = nn.Conv(mid, (k, k), strides=(self.stride,) * 2,
                    padding=((k // 2,) * 2,) * 2,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, name='conv2')(y)
        y = nn.relu(_bn(train, self.dtype, 'bn2')(y))
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name='conv3')(y)
        y = _bn(train, self.dtype, 'bn3')(y)
        if self.attention:
            ratio = max(1.0 / 16, 16.0 / self.out_ch)
            y = ContextBlock(ratio, dtype=self.dtype, name='attention')(y)
        if self.downsample:
            identity = nn.Conv(self.out_ch, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name='ds_conv')(x)
            identity = _bn(train, self.dtype, 'ds_bn')(identity)
        return nn.relu(y + identity)


class ViPNASResNet(nn.Module):
    """ViPNAS-searched ResNet (reference vipnas_resnet.py:343
    ViPNAS_ResNet-50): per-stage searched widths/depths/kernels/groups/
    attention with expansion-1 bottlenecks."""
    wid: Sequence[int] = (48, 80, 160, 304, 608)
    expan: Sequence[int] = (0, 1, 1, 1, 1)
    dep: Sequence[int] = (0, 4, 6, 7, 3)
    ks: Sequence[int] = (7, 3, 5, 5, 5)
    group: Sequence[int] = (0, 16, 16, 16, 16)
    att: Sequence[bool] = (False, True, False, True, True)
    strides: Sequence[int] = (1, 2, 2, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k0 = self.ks[0]
        x = nn.Conv(self.wid[0], (k0, k0), strides=(2, 2),
                    padding=((k0 // 2,) * 2,) * 2, use_bias=False,
                    dtype=self.dtype, name='conv1')(x)
        x = nn.relu(_bn(train, self.dtype, 'bn1')(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        in_ch = self.wid[0]
        for i in range(1, len(self.wid)):
            out_ch = self.wid[i] * self.expan[i]
            stride = self.strides[i - 1]
            for b in range(self.dep[i]):
                s = stride if b == 0 else 1
                ds = b == 0 and (s != 1 or in_ch != out_ch)
                x = ViPNASBottleneck(
                    out_ch, expansion=self.expan[i], stride=s,
                    downsample=ds, kernel_size=self.ks[i],
                    groups=self.group[i], attention=self.att[i],
                    dtype=self.dtype,
                    name=f'layer{i}_{b}')(x, train=train)
                in_ch = out_ch
        return x


class SplitAttention(nn.Module):
    """ResNeSt split-attention over `radix` feature splits."""
    channels: int
    radix: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        y = nn.Conv(self.channels * self.radix, (3, 3),
                    padding=((1, 1), (1, 1)),
                    feature_group_count=self.radix, use_bias=False,
                    dtype=self.dtype, name='conv')(x)
        y = nn.relu(_bn(train, self.dtype, 'bn')(y))
        n, h, w, _ = y.shape
        splits = y.reshape(n, h, w, self.radix, self.channels)
        gap = jnp.sum(splits, axis=3).mean(axis=(1, 2))      # [N, C]
        att = nn.relu(nn.Dense(max(self.channels // 4, 32),
                               dtype=self.dtype, name='fc1')(gap))
        att = nn.Dense(self.channels * self.radix, dtype=self.dtype,
                       name='fc2')(att)
        att = jax.nn.softmax(att.reshape(n, self.radix, self.channels),
                             axis=1)
        return jnp.sum(splits * att[:, None, None], axis=3)


class ResNeStBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    radix: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        y = nn.relu(_bn(train, self.dtype, 'bn1')(
            nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name='conv1')(x)))
        y = SplitAttention(self.planes, self.radix, dtype=self.dtype,
                           name='splat')(y, train=train)
        if self.stride > 1:
            y = nn.avg_pool(y, (3, 3), strides=(self.stride,) * 2,
                            padding=((1, 1), (1, 1)))
        y = _bn(train, self.dtype, 'bn3')(
            nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name='conv3')(y))
        if self.downsample:
            identity = _bn(train, self.dtype, 'ds_bn')(
                nn.Conv(self.planes * 4, (1, 1),
                        strides=(self.stride,) * 2, use_bias=False,
                        dtype=self.dtype, name='ds')(x))
        return nn.relu(y + identity)


class _ResNetLike(nn.Module):
    """Shared ResNet-style trunk over an arbitrary bottleneck block."""
    block_cls: type
    depth: int = 50
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        _, stage_blocks = RESNET_SPECS[self.depth]
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name='conv1')(x)
        x = nn.relu(_bn(train, self.dtype, 'bn1')(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        planes, in_ch = 64, 64
        for si, n_blocks in enumerate(stage_blocks):
            stride = 1 if si == 0 else 2
            for bi in range(n_blocks):
                s = stride if bi == 0 else 1
                ds = bi == 0 and (s != 1 or in_ch != planes * 4)
                x = self.block_cls(planes, stride=s, downsample=ds,
                                   dtype=self.dtype,
                                   name=f'layer{si + 1}_{bi}')(x,
                                                               train=train)
                in_ch = planes * 4
            planes *= 2
        return x


def SCNet(depth=50, dtype=jnp.float32):
    return _ResNetLike(SCBottleneck, depth=depth, dtype=dtype)


def ResNeSt(depth=50, dtype=jnp.float32):
    return _ResNetLike(ResNeStBottleneck, depth=depth, dtype=dtype)


class RegNet(nn.Module):
    """RegNetX-style staged group-conv bottlenecks (widths/depths per
    stage; reference regnet.py parameterizes by w0/wa/wm — we accept the
    resolved per-stage widths directly)."""
    stage_widths: Sequence[int] = (80, 240, 560, 1360)
    stage_depths: Sequence[int] = (2, 6, 15, 2)
    group_width: int = 40
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name='stem')(x)
        x = nn.relu(_bn(train, self.dtype, 'stem_bn')(x))
        for si, (wd, dp) in enumerate(zip(self.stage_widths,
                                          self.stage_depths)):
            groups = max(wd // self.group_width, 1)
            for bi in range(dp):
                stride = 2 if bi == 0 else 1
                identity = x
                y = nn.relu(_bn(train, self.dtype, f's{si}b{bi}_bn1')(
                    nn.Conv(wd, (1, 1), use_bias=False, dtype=self.dtype,
                            name=f's{si}b{bi}_c1')(x)))
                y = nn.relu(_bn(train, self.dtype, f's{si}b{bi}_bn2')(
                    nn.Conv(wd, (3, 3), strides=(stride,) * 2,
                            padding=((1, 1), (1, 1)),
                            feature_group_count=groups, use_bias=False,
                            dtype=self.dtype, name=f's{si}b{bi}_c2')(y)))
                y = _bn(train, self.dtype, f's{si}b{bi}_bn3')(
                    nn.Conv(wd, (1, 1), use_bias=False, dtype=self.dtype,
                            name=f's{si}b{bi}_c3')(y))
                if stride != 1 or identity.shape[-1] != wd:
                    identity = _bn(train, self.dtype, f's{si}b{bi}_dsbn')(
                        nn.Conv(wd, (1, 1), strides=(stride,) * 2,
                                use_bias=False, dtype=self.dtype,
                                name=f's{si}b{bi}_ds')(identity))
                x = nn.relu(y + identity)
        return x


class MobileNetV3(nn.Module):
    """MobileNetV3-small-style inverted residuals with SE + h-swish."""
    dtype: jnp.dtype = jnp.float32
    # (kernel, expand, out, use_se, use_hs, stride)
    ARCH = ((3, 16, 16, True, False, 2), (3, 72, 24, False, False, 2),
            (3, 88, 24, False, False, 1), (5, 96, 40, True, True, 2),
            (5, 240, 40, True, True, 1), (5, 240, 40, True, True, 1),
            (5, 120, 48, True, True, 1), (5, 144, 48, True, True, 1),
            (5, 288, 96, True, True, 2), (5, 576, 96, True, True, 1),
            (5, 576, 96, True, True, 1))

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .classic_cnns import SELayer
        x = nn.Conv(16, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name='stem')(x)
        x = _hswish(_bn(train, self.dtype, 'stem_bn')(x))
        for i, (k, e, o, se, hs, s) in enumerate(self.ARCH):
            act = _hswish if hs else nn.relu
            inp = x
            y = nn.Conv(e, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f'b{i}_exp')(x)
            y = act(_bn(train, self.dtype, f'b{i}_exp_bn')(y))
            p = (k - 1) // 2
            y = nn.Conv(e, (k, k), strides=(s, s), padding=((p, p), (p, p)),
                        feature_group_count=e, use_bias=False,
                        dtype=self.dtype, name=f'b{i}_dw')(y)
            y = act(_bn(train, self.dtype, f'b{i}_dw_bn')(y))
            if se:
                y = SELayer(ratio=4, dtype=self.dtype, name=f'b{i}_se')(y)
            y = nn.Conv(o, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f'b{i}_proj')(y)
            y = _bn(train, self.dtype, f'b{i}_proj_bn')(y)
            if s == 1 and inp.shape[-1] == o:
                y = y + inp
            x = y
        x = nn.Conv(576, (1, 1), use_bias=False, dtype=self.dtype,
                    name='head')(x)
        return _hswish(_bn(train, self.dtype, 'head_bn')(x))


class ShuffleNetV1(nn.Module):
    """ShuffleNetV1 grouped-1x1 + channel-shuffle units."""
    groups: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        chans = {1: (144, 288, 576), 2: (200, 400, 800),
                 3: (240, 480, 960), 4: (272, 544, 1088),
                 8: (384, 768, 1536)}[self.groups]
        g = self.groups
        x = nn.Conv(24, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name='stem')(x)
        x = nn.relu(_bn(train, self.dtype, 'stem_bn')(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        def shuffle(y):
            n, h, w, c = y.shape
            y = y.reshape(n, h, w, g, c // g).swapaxes(3, 4)
            return y.reshape(n, h, w, c)

        for si, (ch, reps) in enumerate(zip(chans, (4, 8, 4))):
            for bi in range(reps):
                stride = 2 if bi == 0 else 1
                identity = x
                body = ch - identity.shape[-1] if stride == 2 else ch
                first_groups = 1 if (si == 0 and bi == 0) else g
                mid = max(body // 4 // g * g, g)
                y = nn.Conv(mid, (1, 1),
                            feature_group_count=first_groups,
                            use_bias=False, dtype=self.dtype,
                            name=f's{si}b{bi}_g1')(x)
                y = nn.relu(_bn(train, self.dtype, f's{si}b{bi}_bn1')(y))
                y = shuffle(y) if first_groups == g else y
                y = nn.Conv(y.shape[-1], (3, 3), strides=(stride,) * 2,
                            padding=((1, 1), (1, 1)),
                            feature_group_count=y.shape[-1],
                            use_bias=False, dtype=self.dtype,
                            name=f's{si}b{bi}_dw')(y)
                y = _bn(train, self.dtype, f's{si}b{bi}_bn2')(y)
                y = nn.Conv(body, (1, 1), feature_group_count=g,
                            use_bias=False, dtype=self.dtype,
                            name=f's{si}b{bi}_g2')(y)
                y = _bn(train, self.dtype, f's{si}b{bi}_bn3')(y)
                if stride == 2:
                    identity = nn.avg_pool(identity, (3, 3),
                                           strides=(2, 2),
                                           padding=((1, 1), (1, 1)))
                    x = nn.relu(jnp.concatenate([identity, y], axis=-1))
                else:
                    x = nn.relu(identity + y)
        return x


class ViPNASMobileNetV3(nn.Module):
    """ViPNAS-searched MobileNetV3 variant (reference vipnas_mbv3.py
    `ViPNAS_MobileNetV3`): per-stage searched widths/expansions/depths/
    kernel sizes/group counts/SE flags/activations."""
    wid: Sequence[int] = (16, 16, 24, 40, 80, 112, 160)
    expan: Sequence[int] = (0, 1, 5, 4, 5, 5, 6)
    dep: Sequence[int] = (0, 1, 4, 4, 4, 4, 4)
    ks: Sequence[int] = (3, 3, 7, 7, 5, 7, 5)
    group: Sequence[int] = (0, 8, 120, 20, 100, 280, 240)
    att: Sequence[bool] = (False, True, True, False, True, True, True)
    stride: Sequence[int] = (2, 1, 2, 2, 2, 1, 2)
    act: Sequence[str] = ('hswish', 'relu', 'relu', 'relu', 'hswish',
                          'hswish', 'hswish')
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .classic_cnns import SELayer

        def activate(y, kind):
            return _hswish(y) if kind == 'hswish' else nn.relu(y)

        k0 = self.ks[0]
        x = nn.Conv(self.wid[0], (k0, k0), strides=(self.stride[0],) * 2,
                    padding=((k0 // 2,) * 2,) * 2, use_bias=False,
                    dtype=self.dtype, name='stem')(x)
        x = activate(_bn(train, self.dtype, 'stem_bn')(x), self.act[0])

        for i in range(1, len(self.wid)):
            mid = self.wid[i] * self.expan[i]
            k = self.ks[i]
            g = max(1, self.group[i])
            assert mid % g == 0, (mid, g)
            for j in range(self.dep[i]):
                stride = self.stride[i] if j == 0 else 1
                inp = x
                y = x
                if self.expan[i] != 1:
                    y = nn.Conv(mid, (1, 1), use_bias=False,
                                dtype=self.dtype,
                                name=f's{i}b{j}_expand')(y)
                    y = activate(_bn(train, self.dtype,
                                     f's{i}b{j}_expand_bn')(y), self.act[i])
                y = nn.Conv(mid, (k, k), strides=(stride,) * 2,
                            padding=((k // 2,) * 2,) * 2,
                            feature_group_count=g, use_bias=False,
                            dtype=self.dtype, name=f's{i}b{j}_dw')(y)
                y = activate(_bn(train, self.dtype,
                                 f's{i}b{j}_dw_bn')(y), self.act[i])
                if self.att[i]:
                    # mmpose InvertedResidual SE: ReLU squeeze + HSigmoid
                    y = SELayer(ratio=4, gate='hsigmoid', dtype=self.dtype,
                                name=f's{i}b{j}_se')(y)
                y = nn.Conv(self.wid[i], (1, 1), use_bias=False,
                            dtype=self.dtype, name=f's{i}b{j}_proj')(y)
                y = _bn(train, self.dtype, f's{i}b{j}_proj_bn')(y)
                if stride == 1 and inp.shape[-1] == self.wid[i]:
                    y = y + inp
                x = y
        return x

"""Lightweight + stacked backbones: MobileNetV2, ShuffleNetV2, Hourglass.

Counterparts of the reference model-zoo backbones
(mmpose/models/backbones/mobilenet_v2.py, shufflenet_v2.py, hourglass.py).
NHWC flax; BN semantics match heads.py. These cover the mobile/realtime and
classic bottom-up families of the zoo.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .resnet import _bn


class InvertedResidual(nn.Module):
    """MobileNetV2 block: 1x1 expand -> 3x3 depthwise -> 1x1 project."""
    out_ch: int
    stride: int = 1
    expand: int = 6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        y = x
        if self.expand != 1:
            y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name='expand')(y)
            y = _bn(train, self.dtype, 'expand_bn')(y)
            y = nn.relu6(y)
        y = nn.Conv(mid, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), feature_group_count=mid,
                    use_bias=False, dtype=self.dtype, name='dw')(y)
        y = _bn(train, self.dtype, 'dw_bn')(y)
        y = nn.relu6(y)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name='project')(y)
        y = _bn(train, self.dtype, 'project_bn')(y)
        if self.stride == 1 and in_ch == self.out_ch:
            y = x + y
        return y


class MobileNetV2(nn.Module):
    """[N, H, W, 3] -> [N, H/32, W/32, 1280]."""
    widen_factor: float = 1.0
    dtype: jnp.dtype = jnp.float32
    # (expand, out, repeats, stride)
    ARCH = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.widen_factor

        def c(ch):
            return max(8, int(ch * w + 4) // 8 * 8)

        x = nn.Conv(c(32), (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name='stem')(x)
        x = _bn(train, self.dtype, 'stem_bn')(x)
        x = nn.relu6(x)
        for li, (e, ch, n, s) in enumerate(self.ARCH):
            for bi in range(n):
                x = InvertedResidual(c(ch), stride=s if bi == 0 else 1,
                                     expand=e, dtype=self.dtype,
                                     name=f'layer{li}_{bi}')(x, train=train)
        x = nn.Conv(1280, (1, 1), use_bias=False, dtype=self.dtype,
                    name='head_conv')(x)
        x = _bn(train, self.dtype, 'head_bn')(x)
        return nn.relu6(x)


class ShuffleUnit(nn.Module):
    """ShuffleNetV2 unit with channel split + shuffle."""
    out_ch: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        half = self.out_ch // 2

        def branch_main(y, name):
            y = nn.Conv(half, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f'{name}_pw1')(y)
            y = _bn(train, self.dtype, f'{name}_bn1')(y)
            y = nn.relu(y)
            y = nn.Conv(half, (3, 3), strides=(self.stride,) * 2,
                        padding=((1, 1), (1, 1)), feature_group_count=half,
                        use_bias=False, dtype=self.dtype,
                        name=f'{name}_dw')(y)
            y = _bn(train, self.dtype, f'{name}_dwbn')(y)
            y = nn.Conv(half, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f'{name}_pw2')(y)
            y = _bn(train, self.dtype, f'{name}_bn2')(y)
            return nn.relu(y)

        if self.stride == 1:
            x1, x2 = jnp.split(x, 2, axis=-1)
            out = jnp.concatenate([x1, branch_main(x2, 'main')], axis=-1)
        else:
            proj = nn.Conv(x.shape[-1], (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)),
                           feature_group_count=x.shape[-1], use_bias=False,
                           dtype=self.dtype, name='proj_dw')(x)
            proj = _bn(train, self.dtype, 'proj_dwbn')(proj)
            proj = nn.Conv(half, (1, 1), use_bias=False, dtype=self.dtype,
                           name='proj_pw')(proj)
            proj = _bn(train, self.dtype, 'proj_bn')(proj)
            proj = nn.relu(proj)
            out = jnp.concatenate([proj, branch_main(x, 'main')], axis=-1)
        # channel shuffle (groups=2)
        n, h, w, ch = out.shape
        out = out.reshape(n, h, w, 2, ch // 2).swapaxes(3, 4)
        return out.reshape(n, h, w, ch)


class ShuffleNetV2(nn.Module):
    widen_factor: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        chans = {0.5: (48, 96, 192), 1.0: (116, 232, 464),
                 1.5: (176, 352, 704), 2.0: (244, 488, 976)}[
                     self.widen_factor]
        x = nn.Conv(24, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name='stem')(x)
        x = _bn(train, self.dtype, 'stem_bn')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for si, (ch, reps) in enumerate(zip(chans, (4, 8, 4))):
            for bi in range(reps):
                x = ShuffleUnit(ch, stride=2 if bi == 0 else 1,
                                dtype=self.dtype,
                                name=f'stage{si}_{bi}')(x, train=train)
        x = nn.Conv(1024, (1, 1), use_bias=False, dtype=self.dtype,
                    name='head_conv')(x)
        x = _bn(train, self.dtype, 'head_bn')(x)
        return nn.relu(x)


def _res_layer(x, train, num_blocks, in_ch, out_ch, name, stride=1,
               downsample_first=True, dtype=jnp.float32):
    """mmpose ResLayer of BasicBlocks (resnet.py:310): the stride/channel
    change happens in the FIRST block (ResNet) or LAST (downsample_first=
    False, Hourglass low3)."""
    from .resnet import BasicBlock
    for k in range(num_blocks):
        if downsample_first:
            first = k == 0
            ch = out_ch
            s = stride if first else 1
            ds = first and (stride != 1 or in_ch != out_ch)
        else:
            last = k == num_blocks - 1
            ch = out_ch if last else in_ch
            s = stride if last else 1
            ds = last and (stride != 1 or in_ch != out_ch)
        x = BasicBlock(ch, stride=s, downsample=ds, dtype=dtype,
                       name=f'{name}_{k}')(x, train=train)
    return x


def _conv_bn(x, train, out_ch, k, name, stride=1, act=True, norm=True,
             dtype=jnp.float32):
    """mmcv ConvModule: conv (bias iff no norm) + BN + optional ReLU."""
    p = k // 2
    x = nn.Conv(out_ch, (k, k), strides=(stride, stride),
                padding=((p, p), (p, p)), use_bias=not norm, dtype=dtype,
                name=f'{name}_conv')(x)
    if norm:
        x = _bn(train, dtype, f'{name}_bn')(x)
    return nn.relu(x) if act else x


class HourglassModule(nn.Module):
    """Recursive hourglass with per-depth channels/blocks (reference
    hourglass.py:15 HourglassModule)."""
    depth: int
    stage_channels: Sequence[int]
    stage_blocks: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        cur_b, next_b = self.stage_blocks[0], self.stage_blocks[1]
        cur_c, next_c = self.stage_channels[0], self.stage_channels[1]
        up1 = _res_layer(x, train, cur_b, cur_c, cur_c, 'up1',
                         dtype=self.dtype)
        low = _res_layer(x, train, cur_b, cur_c, next_c, 'low1', stride=2,
                         dtype=self.dtype)
        if self.depth > 1:
            low = HourglassModule(self.depth - 1, self.stage_channels[1:],
                                  self.stage_blocks[1:], dtype=self.dtype,
                                  name='low2')(low, train=train)
        else:
            low = _res_layer(low, train, next_b, next_c, next_c, 'low2',
                             dtype=self.dtype)
        low = _res_layer(low, train, cur_b, next_c, cur_c, 'low3',
                         downsample_first=False, dtype=self.dtype)
        import jax
        up2 = jax.image.resize(
            low, (low.shape[0], low.shape[1] * 2, low.shape[2] * 2,
                  low.shape[3]), method='nearest')
        return up1 + up2


class Hourglass(nn.Module):
    """Stacked hourglass -> list of per-stack features [N, H/4, W/4, feat].

    Faithful counterpart of reference hourglass.py:89 `HourglassNet`
    (Hourglass-52/104): ConvModule+ResLayer stem, per-depth stage channels,
    out/remap/1x1 inter-stack convs.
    """
    downsample_times: int = 5
    num_stacks: int = 2
    stage_channels: Sequence[int] = (256, 256, 384, 384, 384, 512)
    stage_blocks: Sequence[int] = (2, 2, 2, 2, 2, 4)
    feat_channel: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cur = self.stage_channels[0]
        x = _conv_bn(x, train, 128, 7, 'stem', stride=2, dtype=self.dtype)
        x = _res_layer(x, train, 1, 128, 256, 'stem_res', stride=2,
                       dtype=self.dtype)

        outs = []
        for si in range(self.num_stacks):
            hg = HourglassModule(self.downsample_times, self.stage_channels,
                                 self.stage_blocks, dtype=self.dtype,
                                 name=f'hg{si}')(x, train=train)
            out = _conv_bn(hg, train, self.feat_channel, 3, f'out_conv{si}',
                           dtype=self.dtype)
            outs.append(out)
            if si < self.num_stacks - 1:
                a = _conv_bn(x, train, cur, 1, f'conv1x1_{si}', act=False,
                             dtype=self.dtype)
                b = _conv_bn(out, train, cur, 1, f'remap{si}', act=False,
                             dtype=self.dtype)
                x = _res_layer(nn.relu(a + b), train, 1, cur, cur,
                               f'inters_{si}', dtype=self.dtype)
        return outs


class HourglassAEModule(nn.Module):
    """Recursive AE hourglass of plain ConvModules (reference
    hourglass_ae.py:12)."""
    depth: int
    stage_channels: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        cur_c, next_c = self.stage_channels[0], self.stage_channels[1]
        up1 = _conv_bn(x, train, cur_c, 3, 'up1', dtype=self.dtype)
        low = nn.max_pool(x, (2, 2), strides=(2, 2))
        low = _conv_bn(low, train, next_c, 3, 'low1', dtype=self.dtype)
        if self.depth > 1:
            low = HourglassAEModule(self.depth - 1, self.stage_channels[1:],
                                    dtype=self.dtype,
                                    name='low2')(low, train=train)
        else:
            low = _conv_bn(low, train, next_c, 3, 'low2', dtype=self.dtype)
        low = _conv_bn(low, train, cur_c, 3, 'low3', dtype=self.dtype)
        import jax
        up2 = jax.image.resize(
            low, (low.shape[0], low.shape[1] * 2, low.shape[2] * 2,
                  low.shape[3]), method='nearest')
        return up1 + up2


class HourglassAE(nn.Module):
    """Hourglass-AE (Newell et al., associative embedding) -> list of
    per-stack OUTPUT maps [N, H/4, W/4, out_channels] (the backbone itself
    emits prediction maps; reference hourglass_ae.py:70 HourglassAENet)."""
    downsample_times: int = 4
    num_stacks: int = 1
    out_channels: int = 34
    stage_channels: Sequence[int] = (256, 384, 512, 640, 768)
    feat_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv_bn(x, train, 64, 7, 'stem0', stride=2, dtype=self.dtype)
        x = _conv_bn(x, train, 128, 3, 'stem1', dtype=self.dtype)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = _conv_bn(x, train, 128, 3, 'stem2', dtype=self.dtype)
        x = _conv_bn(x, train, self.feat_channels, 3, 'stem3',
                     dtype=self.dtype)

        outs = []
        for si in range(self.num_stacks):
            hg = HourglassAEModule(self.downsample_times,
                                   self.stage_channels, dtype=self.dtype,
                                   name=f'hg{si}')(x, train=train)
            hg = _conv_bn(hg, train, self.feat_channels, 3, f'hgc{si}_0',
                          dtype=self.dtype)
            hg = _conv_bn(hg, train, self.feat_channels, 3, f'hgc{si}_1',
                          dtype=self.dtype)
            out = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                          name=f'out_conv{si}_conv')(hg)
            outs.append(out)
            if si < self.num_stacks - 1:
                x = (x
                     + _conv_bn(out, train, self.feat_channels, 1,
                                f'remap_out{si}', act=False,
                                dtype=self.dtype)
                     + _conv_bn(hg, train, self.feat_channels, 1,
                                f'remap_feat{si}', act=False,
                                dtype=self.dtype))
        return outs

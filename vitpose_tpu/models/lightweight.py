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


class HourglassModule(nn.Module):
    """Recursive hourglass (down/up with skip), depth levels."""
    depth: int
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        from .resnet import BasicBlock
        up1 = BasicBlock(self.channels, dtype=self.dtype,
                         name='up1')(x, train=train)
        low = nn.max_pool(x, (2, 2), strides=(2, 2))
        low = BasicBlock(self.channels, dtype=self.dtype,
                         name='low1')(low, train=train)
        if self.depth > 1:
            low = HourglassModule(self.depth - 1, self.channels,
                                  dtype=self.dtype,
                                  name='inner')(low, train=train)
        else:
            low = BasicBlock(self.channels, dtype=self.dtype,
                             name='low2')(low, train=train)
        low = BasicBlock(self.channels, dtype=self.dtype,
                         name='low3')(low, train=train)
        import jax
        up2 = jax.image.resize(low, up1.shape, method='nearest')
        return up1 + up2


class Hourglass(nn.Module):
    """Stacked hourglass (Newell et al.) -> list of per-stack features.

    reference hourglass.py `HourglassNet`; classic bottom-up/CPM backbone.
    """
    num_stacks: int = 2
    depth: int = 4
    channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .resnet import BasicBlock
        x = nn.Conv(128, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name='stem')(x)
        x = _bn(train, self.dtype, 'stem_bn')(x)
        x = nn.relu(x)
        x = BasicBlock(128, dtype=self.dtype, name='stem_res')(x,
                                                               train=train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = BasicBlock(self.channels, downsample=True, dtype=self.dtype,
                       name='stem_res2')(x, train=train)

        outs = []
        for si in range(self.num_stacks):
            y = HourglassModule(self.depth, self.channels, dtype=self.dtype,
                                name=f'hg{si}')(x, train=train)
            y = BasicBlock(self.channels, dtype=self.dtype,
                           name=f'res{si}')(y, train=train)
            y = nn.Conv(self.channels, (1, 1), use_bias=False,
                        dtype=self.dtype, name=f'fc{si}')(y)
            y = _bn(train, self.dtype, f'fc{si}_bn')(y)
            y = nn.relu(y)
            outs.append(y)
            if si < self.num_stacks - 1:
                x = x + nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                                name=f'merge{si}')(y)
        return outs

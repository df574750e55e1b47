"""ResNeXt / SE-ResNeXt backbones (grouped-convolution bottlenecks).

Counterparts of reference mmpose/models/backbones/resnext.py:90 and
seresnext.py: the ResNet layout with bottleneck mid-width
``planes * groups * width_per_group / 64`` and a grouped 3x3 conv2
(32x4d default), plus the SE channel gate for SE-ResNeXt.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .resnet import RESNET_SPECS, _bn
from .classic_cnns import SELayer


class ResNeXtBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 32
    width_per_group: int = 4
    se_ratio: int = 0            # 0 = no SE (plain ResNeXt)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        mid = self.planes * self.groups * self.width_per_group // 64
        y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                    name='conv1')(x)
        y = nn.relu(_bn(train, self.dtype, 'bn1')(y))
        y = nn.Conv(mid, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)),
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, name='conv2')(y)
        y = nn.relu(_bn(train, self.dtype, 'bn2')(y))
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name='conv3')(y)
        y = _bn(train, self.dtype, 'bn3')(y)
        if self.se_ratio:
            y = SELayer(self.se_ratio, dtype=self.dtype, name='se')(y)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name='ds_conv')(x)
            identity = _bn(train, self.dtype, 'ds_bn')(identity)
        return nn.relu(y + identity)


class ResNeXt(nn.Module):
    """[N, H, W, 3] -> [N, H/32, W/32, 2048]; 50/101/152 depths."""
    depth: int = 50
    groups: int = 32
    width_per_group: int = 4
    se_ratio: int = 0
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
                x = ResNeXtBottleneck(
                    planes, stride=s, downsample=ds, groups=self.groups,
                    width_per_group=self.width_per_group,
                    se_ratio=self.se_ratio, dtype=self.dtype,
                    name=f'layer{si + 1}_{bi}')(x, train=train)
                in_ch = planes * 4
            planes *= 2
        return x


def SEResNeXt(depth=50, groups=32, width_per_group=4, se_ratio=16,
              dtype=jnp.float32):
    """SE-ResNeXt (reference seresnext.py): ResNeXt + SE gate per block."""
    return ResNeXt(depth=depth, groups=groups,
                   width_per_group=width_per_group, se_ratio=se_ratio,
                   dtype=dtype)

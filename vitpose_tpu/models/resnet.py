"""ResNet backbone family (NHWC flax) — SimpleBaselines-style pose models.

Counterpart of the reference ResNet (mmpose/models/backbones/resnet.py,
torchvision-compatible layout) supporting depths 18/34/50/101/152 with
BasicBlock/Bottleneck. Weight names map 1:1 from torch checkpoints
(`convert_resnet_checkpoint`).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

RESNET_SPECS = {
    18: ('basic', (2, 2, 2, 2)),
    34: ('basic', (3, 4, 6, 3)),
    50: ('bottleneck', (3, 4, 6, 3)),
    101: ('bottleneck', (3, 4, 23, 3)),
    152: ('bottleneck', (3, 8, 36, 3)),
}


def _bn(train, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name='conv1')(x)
        y = _bn(train, self.dtype, 'bn1')(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name='conv2')(y)
        y = _bn(train, self.dtype, 'bn2')(y)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name='ds_conv')(x)
            identity = _bn(train, self.dtype, 'ds_bn')(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name='conv1')(x)
        y = _bn(train, self.dtype, 'bn1')(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name='conv2')(y)
        y = _bn(train, self.dtype, 'bn2')(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name='conv3')(y)
        y = _bn(train, self.dtype, 'bn3')(y)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name='ds_conv')(x)
            identity = _bn(train, self.dtype, 'ds_bn')(identity)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """[N, H, W, 3] -> [N, H/32, W/32, C] feature map."""
    depth: int = 50
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_type, stage_blocks = RESNET_SPECS[self.depth]
        block_cls = BasicBlock if block_type == 'basic' else Bottleneck
        expansion = 1 if block_type == 'basic' else 4

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name='conv1')(x)
        x = _bn(train, self.dtype, 'bn1')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        planes = 64
        in_ch = 64
        for si, n_blocks in enumerate(stage_blocks):
            stride = 1 if si == 0 else 2
            for bi in range(n_blocks):
                s = stride if bi == 0 else 1
                ds = (bi == 0 and (s != 1 or in_ch != planes * expansion))
                x = block_cls(planes, stride=s, downsample=ds,
                              dtype=self.dtype,
                              name=f'layer{si + 1}_{bi}')(x, train=train)
                in_ch = planes * expansion
            planes *= 2
        return x


def convert_resnet_checkpoint(sd, prefix='backbone.'):
    """torchvision-layout ResNet state dict -> flax params + batch_stats."""
    import numpy as np
    params, stats = {}, {}

    def put(tree, path, v):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v

    def conv(name_t, name_f):
        w = sd.get(prefix + name_t + '.weight')
        if w is not None:
            put(params, name_f + ('kernel',), w.transpose(2, 3, 1, 0))

    def bn(name_t, name_f):
        if prefix + name_t + '.weight' in sd:
            put(params, name_f + ('scale',), sd[prefix + name_t + '.weight'])
            put(params, name_f + ('bias',), sd[prefix + name_t + '.bias'])
            put(stats, name_f + ('mean',),
                sd[prefix + name_t + '.running_mean'])
            put(stats, name_f + ('var',),
                sd[prefix + name_t + '.running_var'])

    conv('conv1', ('conv1',))
    bn('bn1', ('bn1',))
    for li in range(1, 5):
        bi = 0
        while f'{prefix}layer{li}.{bi}.conv1.weight' in sd:
            blk = (f'layer{li}_{bi}',)
            for ci in (1, 2, 3):
                conv(f'layer{li}.{bi}.conv{ci}', blk + (f'conv{ci}',))
                bn(f'layer{li}.{bi}.bn{ci}', blk + (f'bn{ci}',))
            conv(f'layer{li}.{bi}.downsample.0', blk + ('ds_conv',))
            bn(f'layer{li}.{bi}.downsample.1', blk + ('ds_bn',))
            bi += 1
    return params, stats

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
    # ResNeSt-only depths (reference resnest.py:217 arch_settings)
    200: ('bottleneck', (3, 24, 36, 3)),
    269: ('bottleneck', (3, 30, 48, 3)),
}


def _bn(train, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


def _avg_down_pool(x, stride):
    """2x2 (=stride) average pool, ceil_mode + count_include_pad=False —
    the AvgPool the reference inserts before the 1x1 downsample conv when
    ``avg_down=True`` (resnet.py:355-362)."""
    h, w = x.shape[1], x.shape[2]
    pad = ((0, (-h) % stride), (0, (-w) % stride))
    return nn.avg_pool(x, (stride, stride), strides=(stride, stride),
                       padding=pad, count_include_pad=False)


def _shortcut(x, out_ch, stride, avg_down, dtype):
    if avg_down and stride != 1:
        x = _avg_down_pool(x, stride)
        stride = 1
    x = nn.Conv(out_ch, (1, 1), strides=(stride,) * 2, use_bias=False,
                dtype=dtype, name='ds_conv')(x)
    return x


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    avg_down: bool = False
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
            identity = _shortcut(x, self.planes, self.stride, self.avg_down,
                                 self.dtype)
            identity = _bn(train, self.dtype, 'ds_bn')(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    avg_down: bool = False
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
            identity = _shortcut(x, self.planes * 4, self.stride,
                                 self.avg_down, self.dtype)
            identity = _bn(train, self.dtype, 'ds_bn')(identity)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """[N, H, W, 3] -> [N, H/32, W/32, C] feature map.

    ``deep_stem``/``avg_down`` reproduce the reference's ResNetV1d options
    (mmpose/models/backbones/resnet.py:447-449,573-607): the 7x7 stem conv
    becomes three 3x3 convs (32-32-64), and strided shortcuts pool first
    (2x2 ceil-mode AvgPool) then 1x1-conv at stride 1.
    """
    depth: int = 50
    deep_stem: bool = False
    avg_down: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_type, stage_blocks = RESNET_SPECS[self.depth]
        block_cls = BasicBlock if block_type == 'basic' else Bottleneck
        expansion = 1 if block_type == 'basic' else 4

        if self.deep_stem:
            for i, (ch, s) in enumerate([(32, 2), (32, 1), (64, 1)]):
                x = nn.Conv(ch, (3, 3), strides=(s, s),
                            padding=((1, 1), (1, 1)), use_bias=False,
                            dtype=self.dtype, name=f'stem_conv{i + 1}')(x)
                x = _bn(train, self.dtype, f'stem_bn{i + 1}')(x)
                x = nn.relu(x)
        else:
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
                              avg_down=self.avg_down, dtype=self.dtype,
                              name=f'layer{si + 1}_{bi}')(x, train=train)
                in_ch = planes * expansion
            planes *= 2
        return x


def ResNetV1d(depth=50, dtype=jnp.float32, **kw):
    """Bag-of-tricks ResNetV1d (reference resnet.py:698-710)."""
    return ResNet(depth=depth, deep_stem=True, avg_down=True, dtype=dtype,
                  **kw)


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
    # deep stem (ResNetV1d): stem.{i}.conv / stem.{i}.bn ConvModules
    for i in range(3):
        conv(f'stem.{i}.conv', (f'stem_conv{i + 1}',))
        bn(f'stem.{i}.bn', (f'stem_bn{i + 1}',))
    for li in range(1, 5):
        bi = 0
        while f'{prefix}layer{li}.{bi}.conv1.weight' in sd:
            blk = (f'layer{li}_{bi}',)
            for ci in (1, 2, 3):
                conv(f'layer{li}.{bi}.conv{ci}', blk + (f'conv{ci}',))
                bn(f'layer{li}.{bi}.bn{ci}', blk + (f'bn{ci}',))
            if f'{prefix}layer{li}.{bi}.downsample.1.weight' in sd and \
                    sd[f'{prefix}layer{li}.{bi}.downsample.1.weight'].ndim \
                    == 4:
                # avg_down layout: [AvgPool, conv, bn] (resnet.py:355-371)
                conv(f'layer{li}.{bi}.downsample.1', blk + ('ds_conv',))
                bn(f'layer{li}.{bi}.downsample.2', blk + ('ds_bn',))
            else:
                conv(f'layer{li}.{bi}.downsample.0', blk + ('ds_conv',))
                bn(f'layer{li}.{bi}.downsample.1', blk + ('ds_bn',))
            bi += 1
    return params, stats

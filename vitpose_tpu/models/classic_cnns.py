"""Classic CNN backbones: VGG, AlexNet, SE-ResNet, CPM.

Counterparts of reference mmpose/models/backbones/{vgg,alexnet,seresnet,
cpm}.py — the remaining widely-used families of the model zoo. NHWC flax,
BN conventions as elsewhere.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .resnet import _bn

VGG_SPECS = {
    11: (1, 1, 2, 2, 2),
    13: (2, 2, 2, 2, 2),
    16: (2, 2, 3, 3, 3),
    19: (2, 2, 4, 4, 4),
}


class VGG(nn.Module):
    depth: int = 16
    with_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        chans = (64, 128, 256, 512, 512)
        for si, (reps, ch) in enumerate(zip(VGG_SPECS[self.depth], chans)):
            for bi in range(reps):
                x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                            use_bias=not self.with_bn, dtype=self.dtype,
                            name=f'conv{si}_{bi}')(x)
                if self.with_bn:
                    x = _bn(train, self.dtype, f'bn{si}_{bi}')(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class AlexNet(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=((2, 2), (2, 2)),
                    dtype=self.dtype, name='conv1')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(192, (5, 5), padding=((2, 2), (2, 2)),
                    dtype=self.dtype, name='conv2')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        for i, ch in enumerate((384, 256, 256)):
            x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name=f'conv{i + 3}')(x)
            x = nn.relu(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2))


class SELayer(nn.Module):
    """Squeeze-and-excitation channel gating (reference utils/se_layer.py:
    avgpool -> 1x1 conv + ReLU -> 1x1 conv + gate). gate='hsigmoid' uses
    mmcv HSigmoid(bias=3, divisor=6) as in MobileNetV3/ViPNAS SE configs."""
    ratio: int = 16
    gate: str = 'sigmoid'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))
        s = nn.relu(nn.Dense(max(int(ch / self.ratio), 1), dtype=self.dtype,
                             name='fc1')(s))
        s = nn.Dense(ch, dtype=self.dtype, name='fc2')(s)
        if self.gate == 'hsigmoid':
            s = jnp.clip((s + 3.0) / 6.0, 0.0, 1.0)
        else:
            s = nn.sigmoid(s)
        return x * s[:, None, None, :]


class SEBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    se_ratio: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        # bottleneck body with SE gating before the residual add
        z = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name='conv1')(x)
        z = _bn(train, self.dtype, 'bn1')(z)
        z = nn.relu(z)
        z = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name='conv2')(z)
        z = _bn(train, self.dtype, 'bn2')(z)
        z = nn.relu(z)
        z = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name='conv3')(z)
        z = _bn(train, self.dtype, 'bn3')(z)
        z = SELayer(self.se_ratio, dtype=self.dtype, name='se')(z)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name='ds_conv')(x)
            identity = _bn(train, self.dtype, 'ds_bn')(identity)
        return nn.relu(z + identity)


class SEResNet(nn.Module):
    depth: int = 50
    se_ratio: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .resnet import RESNET_SPECS
        _, stage_blocks = RESNET_SPECS[self.depth]
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name='conv1')(x)
        x = _bn(train, self.dtype, 'bn1')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        planes, in_ch = 64, 64
        for si, n_blocks in enumerate(stage_blocks):
            stride = 1 if si == 0 else 2
            for bi in range(n_blocks):
                s = stride if bi == 0 else 1
                ds = bi == 0 and (s != 1 or in_ch != planes * 4)
                x = SEBottleneck(planes, stride=s, downsample=ds,
                                 se_ratio=self.se_ratio, dtype=self.dtype,
                                 name=f'layer{si + 1}_{bi}')(x, train=train)
                in_ch = planes * 4
            planes *= 2
        return x


class CPM(nn.Module):
    """Convolutional Pose Machines (reference cpm.py:53): a stem that emits
    stage-1 heatmaps, a shared 'middle' feature trunk, and num_stages-1
    refinement stages consuming [previous heatmaps, middle features].
    Returns a list of per-stage heatmaps [N, K, H/8, W/8]."""
    out_channels: int = 17
    num_stages: int = 6
    feat_channels: int = 128
    middle_channels: int = 32
    dtype: jnp.dtype = jnp.float32

    def _cbr(self, x, train, ch, k, name, act=True):
        pad = (k - 1) // 2
        x = nn.Conv(ch, (k, k), padding=((pad, pad), (pad, pad)),
                    use_bias=False, dtype=self.dtype,
                    name=f'{name}_conv')(x)
        x = _bn(train, self.dtype, f'{name}_bn')(x)
        return nn.relu(x) if act else x

    @nn.compact
    def __call__(self, x, train: bool = False):
        k_out = self.out_channels

        def pool(y):
            return nn.max_pool(y, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)))

        # stem -> stage-1 heatmaps
        y = pool(self._cbr(x, train, 128, 9, 'stem0'))
        y = pool(self._cbr(y, train, 128, 9, 'stem1'))
        y = pool(self._cbr(y, train, 128, 9, 'stem2'))
        y = self._cbr(y, train, 32, 5, 'stem3')
        y = self._cbr(y, train, 512, 9, 'stem4')
        y = self._cbr(y, train, 512, 1, 'stem5')
        out = nn.Conv(k_out, (1, 1), dtype=self.dtype,
                      name='stem6_conv')(y)

        # shared middle features
        m = pool(self._cbr(x, train, 128, 9, 'mid0'))
        m = pool(self._cbr(m, train, 128, 9, 'mid1'))
        m = pool(self._cbr(m, train, 128, 9, 'mid2'))

        outs = [out]
        for t in range(self.num_stages - 1):
            mc = self._cbr(m, train, self.middle_channels, 5,
                           f'midconv{t}')
            y = jnp.concatenate([outs[-1], mc], axis=-1)
            for i in range(3):
                y = self._cbr(y, train, self.feat_channels, 11,
                              f'stage{t}_b{i}')
            y = self._cbr(y, train, self.feat_channels, 1,
                          f'stage{t}_fc')
            out = nn.Conv(k_out, (1, 1), dtype=self.dtype,
                          name=f'stage{t}_out_conv')(y)
            outs.append(out)
        return [o.transpose(0, 3, 1, 2) for o in outs]

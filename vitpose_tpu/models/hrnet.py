"""HRNet backbone (NHWC flax) — high-resolution multi-branch network.

Counterpart of the reference HRNet (mmpose/models/backbones/hrnet.py,
604 LoC torch). Structure: stem (2x stride-2 conv) -> stage1 (4 bottleneck)
-> transitions adding parallel branches at 1/4, 1/8, 1/16, 1/32 -> stages of
exchange modules with all-to-all fusion (strided 3x3 convs down, nearest
upsample + 1x1 conv up). Output: the highest-resolution branch [N, H/4,
W/4, C], the standard pose-HRNet head input.

Configured by `HRNetConfig` mirroring the reference's stage dicts, e.g.
HRNet-W32: channels (32, 64, 128, 256).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import BasicBlock, Bottleneck, _bn


@dataclasses.dataclass(frozen=True)
class HRNetConfig:
    width: int = 32
    # (num_modules, num_blocks per branch) per stage 2..4
    stage_modules: Tuple[int, int, int] = (1, 4, 3)
    stage_blocks: int = 4
    # HRNetV2 (face/hand zoo flagship): final stage keeps every branch
    # (multiscale_output=True) and the forward returns the bilinear-
    # upsampled channel concat at 1/4 resolution (reference hrnet.py
    # stage4 multiscale_output + the hrnetv2_w18_*.py configs'
    # input_transform='resize_concat' head, upsample mode='bilinear',
    # align_corners=False)
    multiscale_concat: bool = False
    dtype: str = 'float32'

    @property
    def channels(self):
        w = self.width
        return (w, w * 2, w * 4, w * 8)


class ExchangeModule(nn.Module):
    """One HR module: per-branch basic blocks, then all-to-all fusion.

    multiscale=False builds fusion only for the highest-resolution branch
    (the reference's multiscale_output=False final module, hrnet.py
    HRModule._make_fuse_layers)."""
    channels: Sequence[int]
    num_blocks: int = 4
    multiscale: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train=False):
        n_br = len(xs)
        outs = []
        for bi, x in enumerate(xs):
            for k in range(self.num_blocks):
                x = BasicBlock(self.channels[bi], dtype=self.dtype,
                               name=f'branch{bi}_block{k}')(x, train=train)
            outs.append(x)
        # fusion: target branch i receives from every branch j
        fused = []
        for i in range(n_br if self.multiscale else 1):
            acc = None
            for j in range(n_br):
                y = outs[j]
                if j > i:
                    # upsample: 1x1 conv then nearest resize
                    y = nn.Conv(self.channels[i], (1, 1), use_bias=False,
                                dtype=self.dtype,
                                name=f'fuse{i}_{j}_conv')(y)
                    y = _bn(train, self.dtype, f'fuse{i}_{j}_bn')(y)
                    th, tw = outs[i].shape[1:3]
                    y = jax.image.resize(y, (y.shape[0], th, tw,
                                             y.shape[-1]), method='nearest')
                elif j < i:
                    # downsample: (i - j) strided 3x3 convs
                    for s in range(i - j):
                        last = s == i - j - 1
                        ch = self.channels[i] if last else self.channels[j]
                        y = nn.Conv(ch, (3, 3), strides=(2, 2),
                                    padding=((1, 1), (1, 1)), use_bias=False,
                                    dtype=self.dtype,
                                    name=f'fuse{i}_{j}_down{s}_conv')(y)
                        y = _bn(train, self.dtype,
                                f'fuse{i}_{j}_down{s}_bn')(y)
                        if not last:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            fused.append(nn.relu(acc))
        return fused


class HRNet(nn.Module):
    cfg: HRNetConfig = HRNetConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        # stem: 1/4 resolution
        for i in (1, 2):
            x = nn.Conv(64, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=dtype, name=f'stem_conv{i}')(x)
            x = _bn(train, dtype, f'stem_bn{i}')(x)
            x = nn.relu(x)
        # stage 1: 4 bottleneck blocks at 64 planes (256 out)
        for k in range(4):
            x = Bottleneck(64, downsample=(k == 0), dtype=dtype,
                           name=f'layer1_{k}')(x, train=train)

        chans = c.channels
        # transition 1: branch 0 (3x3 conv to w), branch 1 (strided conv)
        b0 = nn.relu(_bn(train, dtype, 'tr1_bn0')(
            nn.Conv(chans[0], (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=dtype, name='tr1_conv0')(x)))
        b1 = nn.relu(_bn(train, dtype, 'tr1_bn1')(
            nn.Conv(chans[1], (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=dtype,
                    name='tr1_conv1')(x)))
        xs = [b0, b1]

        n_stages = len(c.stage_modules)
        for stage, n_mod in enumerate(c.stage_modules):
            n_br = stage + 2
            for m in range(n_mod):
                last = stage == n_stages - 1 and m == n_mod - 1
                xs = ExchangeModule(chans[:n_br], c.stage_blocks,
                                    multiscale=not last
                                    or c.multiscale_concat, dtype=dtype,
                                    name=f'stage{stage + 2}_mod{m}')(
                                        xs, train=train)
            if stage < len(c.stage_modules) - 1:
                # add a new branch from the lowest-resolution one
                y = nn.relu(_bn(train, dtype, f'tr{stage + 2}_bn')(
                    nn.Conv(chans[n_br], (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), use_bias=False,
                            dtype=dtype, name=f'tr{stage + 2}_conv')(
                                xs[-1])))
                xs = xs + [y]
        if c.multiscale_concat:
            n, th, tw, _ = xs[0].shape
            ups = [xs[0]]
            for y in xs[1:]:
                ups.append(jax.image.resize(
                    y, (n, th, tw, y.shape[-1]), method='bilinear'))
            return jnp.concatenate(ups, axis=-1)
        return xs[0]

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


class _DownStage(nn.Module):
    """ResNet-style downsampling trunk -> feature pyramid [1/4 ... 1/32]."""
    channels: Sequence[int] = (64, 128, 256, 512)
    blocks_per: int = 2
    use_rsb: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        feats = []
        for si, ch in enumerate(self.channels):
            stride = 1 if si == 0 else 2
            for bi in range(self.blocks_per):
                s = stride if bi == 0 else 1
                ds = bi == 0
                if self.use_rsb:
                    x = RSB(ch, stride=s, downsample=ds, dtype=self.dtype,
                            name=f'd{si}_{bi}')(x, train=train)
                else:
                    x = BasicBlock(ch, stride=s, downsample=ds,
                                   dtype=self.dtype,
                                   name=f'd{si}_{bi}')(x, train=train)
            feats.append(x)
        return feats


class RSB(nn.Module):
    """Residual Steps Block (RSN): split into 4 branches; branch i applies
    i+1 successive 3x3 convs with dense element-wise feeds from branch i-1
    (reference rsn.py `RSB`)."""
    out_ch: int
    stride: int = 1
    downsample: bool = False
    num_steps: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        branch_ch = self.out_ch // self.num_steps
        y = nn.Conv(branch_ch * self.num_steps, (1, 1),
                    strides=(self.stride,) * 2, use_bias=False,
                    dtype=self.dtype, name='reduce')(x)
        y = nn.relu(_bn(train, self.dtype, 'reduce_bn')(y))
        splits = jnp.split(y, self.num_steps, axis=-1)
        outs = []
        prev = None
        for i, s in enumerate(splits):
            cur = s if prev is None else s + prev
            for j in range(i + 1):
                cur = nn.Conv(branch_ch, (3, 3), padding=((1, 1), (1, 1)),
                              use_bias=False, dtype=self.dtype,
                              name=f'step{i}_{j}')(cur)
                cur = nn.relu(_bn(train, self.dtype,
                                  f'step{i}_{j}_bn')(cur))
            outs.append(cur)
            prev = cur
        y = jnp.concatenate(outs, axis=-1)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name='expand')(y)
        y = _bn(train, self.dtype, 'expand_bn')(y)
        if self.downsample or identity.shape[-1] != self.out_ch:
            identity = nn.Conv(self.out_ch, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name='ds')(identity)
            identity = _bn(train, self.dtype, 'ds_bn')(identity)
        return nn.relu(y + identity)


class _UpStage(nn.Module):
    """Top-down path: upsample + lateral skip, emitting per-scale outs."""
    out_ch: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train=False):
        outs = []
        up = None
        for si in range(len(feats) - 1, -1, -1):
            lat = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                          dtype=self.dtype, name=f'lat{si}')(feats[si])
            lat = _bn(train, self.dtype, f'lat{si}_bn')(lat)
            if up is not None:
                up_r = jax.image.resize(up, lat.shape, method='nearest')
                lat = lat + up_r
            lat = nn.relu(lat)
            outs.append(lat)
            up = lat
        return outs[::-1]                 # high-res last -> [1/4 ... 1/32]


class MSPN(nn.Module):
    """Multi-Stage Pose Network: `num_stages` down/up units with cross-stage
    aggregation; returns list over stages of lists over scales."""
    num_stages: int = 2
    unit_channels: int = 256
    use_rsb: bool = False                 # True => RSN
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name='stem')(x)
        x = nn.relu(_bn(train, self.dtype, 'stem_bn')(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        stage_outs = []
        skip = None
        for st in range(self.num_stages):
            inp = x if skip is None else x + skip
            feats = _DownStage(use_rsb=self.use_rsb, dtype=self.dtype,
                               name=f'down{st}')(inp, train=train)
            ups = _UpStage(self.unit_channels, dtype=self.dtype,
                           name=f'up{st}')(feats, train=train)
            stage_outs.append(ups)
            if st < self.num_stages - 1:
                # cross-stage aggregation back to the stem resolution
                skip = nn.Conv(64, (1, 1), use_bias=False, dtype=self.dtype,
                               name=f'agg{st}')(ups[0])
                skip = nn.relu(_bn(train, self.dtype, f'agg{st}_bn')(skip))
        return stage_outs


def RSN(num_stages=2, unit_channels=256, dtype=jnp.float32):
    """RSN = MSPN topology with Residual Steps Blocks."""
    return MSPN(num_stages=num_stages, unit_channels=unit_channels,
                use_rsb=True, dtype=dtype)


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

"""HRFormer backbone: HRNet topology with local-window transformer blocks.

Faithful counterpart of reference mmpose/models/backbones/hrformer.py:
stem + bottleneck stage1, then parallel branches of HRFormerBlocks — LN ->
window attention (center-padded windows, Swin-style relative position
bias, hrformer.py:53 WindowMSA) and LN -> CrossFFN (1x1 -> BN -> GELU ->
depthwise 3x3 -> BN -> GELU -> 1x1 -> BN -> GELU, hrformer.py:260) — fused
HRNet-style with depthwise-separable downsample chains and bilinear
(align_corners=False) upsample (hrformer.py:504 _make_fuse_layers).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import Bottleneck, _bn


def _rel_position_index(wh, ww):
    """Swin-style relative-position lookup indices [Wh*Ww, Wh*Ww]
    (reference hrformer.py:100-104 double_step_seq + flip)."""
    import numpy as np
    seq1 = np.arange(wh) * (2 * ww - 1)
    seq2 = np.arange(ww)
    coords = (seq1[:, None] + seq2[None, :]).reshape(1, -1)
    idx = coords + coords.T
    return idx[:, ::-1].copy()


def _window_partition(x, ws):
    """[N, H, W, C] -> [N*nw, ws*ws, C]; CENTER-pads to multiples of ws
    (reference LocalWindowSelfAttention.forward, hrformer.py:215-230)."""
    n, h, w, c = x.shape
    ph = (ws - h % ws) % ws
    pw = (ws - w % ws) % ws
    if ph or pw:
        x = jnp.pad(x, [(0, 0), (ph // 2, ph - ph // 2),
                        (pw // 2, pw - pw // 2), (0, 0)])
    hp, wp = h + ph, w + pw
    x = x.reshape(n, hp // ws, ws, wp // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
    return x, (hp, wp), (h, w), (ph, pw)


def _window_merge(x, ws, padded_hw, orig_hw, pads, n):
    hp, wp = padded_hw
    h, w = orig_hw
    ph, pw = pads
    c = x.shape[-1]
    x = x.reshape(n, hp // ws, wp // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, hp, wp, c)
    return x[:, ph // 2:h + ph // 2, pw // 2:w + pw // 2]


class WindowAttention(nn.Module):
    num_heads: int
    window_size: int = 7
    with_rpe: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = x.shape[0]
        win, padded, orig, pads = _window_partition(x, self.window_size)
        b, t, c = win.shape
        hd = c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name='qkv')(win)
        qkv = qkv.reshape(b, t, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum('bqhd,bkhd->bhqk', q * hd ** -0.5, k,
                          preferred_element_type=jnp.float32)
        if self.with_rpe:
            ws = self.window_size
            table = self.param(
                'rel_pos_bias_table',
                nn.initializers.truncated_normal(0.02),
                ((2 * ws - 1) * (2 * ws - 1), self.num_heads), self.dtype)
            idx = jnp.asarray(_rel_position_index(ws, ws).flatten())
            bias = table[idx].reshape(ws * ws, ws * ws, self.num_heads)
            attn = attn + bias.transpose(2, 0, 1)[None].astype(jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum('bhqk,bkhd->bqhd', attn, v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(b, t, c).astype(self.dtype)
        out = nn.Dense(c, dtype=self.dtype, name='proj')(out)
        return _window_merge(out, self.window_size, padded, orig, pads, n)


class HRFormerBlock(nn.Module):
    """LN -> window attention; LN -> CrossFFN (reference HRFormerBlock)."""
    num_heads: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        c = x.shape[-1]
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name='norm1')(x)
        x = x + WindowAttention(self.num_heads, self.window_size,
                                dtype=self.dtype, name='attn')(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name='norm2')(x)
        hidden = int(c * self.mlp_ratio)
        # CrossFFN: conv -> BN -> GELU three times (1x1, dw3x3, 1x1)
        y = nn.Conv(hidden, (1, 1), dtype=self.dtype, name='ffn_fc1')(y)
        y = _bn(train, self.dtype, 'ffn_bn1')(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Conv(hidden, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=hidden, dtype=self.dtype,
                    name='ffn_dw')(y)
        y = _bn(train, self.dtype, 'ffn_bn2')(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name='ffn_fc2')(y)
        y = _bn(train, self.dtype, 'ffn_bn3')(y)
        y = nn.gelu(y, approximate=False)
        return x + y


class HRFormerFuse(nn.Module):
    """HRFormer fuse layers: depthwise-separable stride-2 chains down,
    1x1 conv + BN + bilinear up (reference _make_fuse_layers)."""
    channels: Sequence[int]
    multiscale: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train=False):
        n_br = len(xs)
        fused = []
        for i in range(n_br if self.multiscale else 1):
            acc = None
            for j in range(n_br):
                y = xs[j]
                if j > i:
                    y = nn.Conv(self.channels[i], (1, 1), use_bias=False,
                                dtype=self.dtype,
                                name=f'fuse{i}_{j}_conv')(y)
                    y = _bn(train, self.dtype, f'fuse{i}_{j}_bn')(y)
                    th, tw = xs[i].shape[1:3]
                    y = jax.image.resize(
                        y, (y.shape[0], th, tw, y.shape[-1]),
                        method='bilinear')
                elif j < i:
                    for s in range(i - j):
                        last = s == i - j - 1
                        ch_in = self.channels[j]
                        ch_out = self.channels[i] if last \
                            else self.channels[j]
                        y = nn.Conv(ch_in, (3, 3), strides=(2, 2),
                                    padding=((1, 1), (1, 1)),
                                    feature_group_count=ch_in,
                                    use_bias=False, dtype=self.dtype,
                                    name=f'fuse{i}_{j}_d{s}_dw')(y)
                        y = _bn(train, self.dtype,
                                f'fuse{i}_{j}_d{s}_dwbn')(y)
                        y = nn.Conv(ch_out, (1, 1), use_bias=False,
                                    dtype=self.dtype,
                                    name=f'fuse{i}_{j}_d{s}_pw')(y)
                        y = _bn(train, self.dtype,
                                f'fuse{i}_{j}_d{s}_pwbn')(y)
                        if not last:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            fused.append(nn.relu(acc))
        return fused


class HRFormer(nn.Module):
    """Stem + stage1 bottlenecks, then transformer branches with HRFormer
    fusion; returns the high-resolution branch [N, H/4, W/4, width]."""
    width: int = 32
    num_heads: Sequence[int] = (1, 2, 4, 8)
    window_size: int = 7
    stage_modules: Sequence[int] = (1, 2, 2)
    blocks_per_module: int = 2
    mlp_ratios: Sequence[int] = (4, 4, 4, 4)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.width
        chans = (w, w * 2, w * 4, w * 8)
        for i in (1, 2):
            x = nn.Conv(64, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=self.dtype,
                        name=f'stem{i}')(x)
            x = nn.relu(_bn(train, self.dtype, f'stem{i}_bn')(x))
        for k in range(2):
            x = Bottleneck(64, downsample=(k == 0), dtype=self.dtype,
                           name=f'layer1_{k}')(x, train=train)

        b0 = nn.relu(_bn(train, self.dtype, 'tr1_bn0')(
            nn.Conv(chans[0], (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name='tr1_conv0')(x)))
        b1 = nn.relu(_bn(train, self.dtype, 'tr1_bn1')(
            nn.Conv(chans[1], (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name='tr1_conv1')(x)))
        xs = [b0, b1]
        n_stages = len(self.stage_modules)
        for stage, n_mod in enumerate(self.stage_modules):
            n_br = stage + 2
            for m in range(n_mod):
                for t in range(self.blocks_per_module):
                    xs = [HRFormerBlock(
                        self.num_heads[bi], self.window_size,
                        mlp_ratio=self.mlp_ratios[bi], dtype=self.dtype,
                        name=f's{stage}_m{m}_b{bi}_t{t}')(xi, train=train)
                        for bi, xi in enumerate(xs)]
                last = stage == n_stages - 1 and m == n_mod - 1
                xs = HRFormerFuse(chans[:n_br], multiscale=not last,
                                  dtype=self.dtype,
                                  name=f's{stage}_m{m}_fuse')(
                                      xs, train=train)
            if stage < n_stages - 1:
                y = nn.Conv(chans[n_br], (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), use_bias=False,
                            dtype=self.dtype, name=f'tr{stage + 2}')(xs[-1])
                xs = xs + [nn.relu(_bn(train, self.dtype,
                                       f'tr{stage + 2}_bn')(y))]
        return xs[0]

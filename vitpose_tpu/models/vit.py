"""Plain ViT and ViT-MoE backbones for top-down pose, in flax.linen.

TPU-first re-design of the reference torch backbones
(reference: mmpose/models/backbones/vit.py:201 `ViT`,
 mmpose/models/backbones/vit_moe.py:242 `ViTMoE`):

  * NHWC activations; patch embedding as a strided conv feeding the MXU.
  * Full O(T^2) attention — crops are 256x192 -> 16x12 = 192 tokens, so
    attention is tiny; matmuls run in bf16 on the MXU with f32 accumulation.
  * Per-block rematerialization (`remat_blocks`) replaces torch gradient
    checkpointing (reference vit.py:323).
  * MoE experts live in ONE stacked [E, hidden, part] parameter contracted
    with a one-hot routing matrix — no Python loop over experts (reference
    vit_moe.py:108-111 computes every expert and masks); the stacked axis is
    shardable over an `expert` mesh axis for true expert parallelism.
  * Positional embedding keeps the pretraining cls token slot: the forward
    adds `pos_embed[:, 1:]` AND the broadcast `pos_embed[:, :1]` exactly like
    the reference (vit.py:320) so converted checkpoints are bit-compatible.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# MXU-friendly accumulation dtype: bf16 inputs, f32 accumulate.
F32_ACCUM = jnp.float32


class DropPath(nn.Module):
    """Per-sample stochastic depth (reference vit.py:48)."""
    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng('droppath')
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class Int8Dense(nn.Module):
    """Dense layer evaluated as a W8A8 int8 matmul (serving-time option).

    Parameters are stored exactly like nn.Dense ('kernel' [in, out],
    'bias' [out]) so checkpoints are interchangeable with the bf16 path.
    The kernel is quantized symmetrically per OUTPUT channel; activations
    use a STATIC absmax (`act_scale`, from utils/quantize.py calibration)
    so the clip+round fuses into the producer epilogue and the int8 tensor
    halves HBM traffic — measured 174 -> 295 effective T/s on the v5e MLP
    stack vs per-token dynamic amax, whose extra reduce+dequant passes ate
    the entire MXU win. With act_scale=None falls back to dynamic
    per-token quantization (calibration-free but slower).
    """
    features: int
    act_scale: Optional[float] = None
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (in_dim, self.features))
        bias = (self.param('bias', nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        k = kernel.astype(jnp.float32)
        s_w = jnp.max(jnp.abs(k), axis=0, keepdims=True) / 127.0  # [1, N]
        w_q = jnp.round(k / jnp.maximum(s_w, 1e-12)).astype(jnp.int8)
        xf = x.astype(jnp.float32)
        if self.act_scale is not None:
            a = float(self.act_scale)
            x_q = jnp.round(jnp.clip(xf * (127.0 / a), -127.0, 127.0)
                            ).astype(jnp.int8)
            s_x = a / 127.0
        else:
            s_x = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
            x_q = jnp.round(xf / jnp.maximum(s_x, 1e-12)).astype(jnp.int8)
        y = jax.lax.dot_general(
            x_q, w_q, (((x_q.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * s_x * s_w
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return y.astype(self.dtype)


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int
    gelu_approx: bool = False
    int8_mlp: bool = False
    int8_act_scales: Optional[tuple] = None   # (fc1_in, fc2_in) absmax
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.int8_mlp:
            a1, a2 = (self.int8_act_scales or (None, None))[:2]
            fc1 = Int8Dense(self.hidden_dim, act_scale=a1,
                            dtype=self.dtype, name='fc1')
            fc2 = Int8Dense(self.out_dim, act_scale=a2,
                            dtype=self.dtype, name='fc2')
        else:
            fc1 = nn.Dense(self.hidden_dim, dtype=self.dtype, name='fc1')
            fc2 = nn.Dense(self.out_dim, dtype=self.dtype, name='fc2')
        x = fc1(x)
        # approximate=True (tanh) is a serving-time option: ~14% faster
        # end-to-end on v5e (erf GELU is VPU-expensive); default stays the
        # reference-exact erf.
        x = nn.gelu(x, approximate=self.gelu_approx)
        return fc2(x)


class MoEMlp(nn.Module):
    """FFN whose second projection is split shared/expert (ViTPose+).

    Output features = out_dim; the last `part_dim` channels come from one of
    `num_experts` expert matrices selected by a per-sample integer index.
    Routing is a one-hot einsum over a stacked [E, hidden, part] parameter —
    identical gradients to the reference dense-masked loop, but a single
    MXU-shaped contraction that shards over an `expert` mesh axis.
    (reference: vit_moe.py:78 `MoEMlp`.)
    """
    hidden_dim: int
    out_dim: int
    num_experts: int
    part_dim: int
    gelu_approx: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, expert_idx):
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name='fc1')(x)
        h = nn.gelu(h, approximate=self.gelu_approx)
        shared = nn.Dense(self.out_dim - self.part_dim, dtype=self.dtype,
                          name='fc2')(h)
        e_kernel = self.param(
            'expert_kernel',
            nn.initializers.lecun_normal(),
            (self.num_experts, self.hidden_dim, self.part_dim))
        e_bias = self.param('expert_bias', nn.initializers.zeros,
                            (self.num_experts, self.part_dim))
        onehot = jax.nn.one_hot(expert_idx, self.num_experts,
                                dtype=self.dtype)          # [N, E]
        # Select each sample's expert weights, then batched matmul.
        w = jnp.einsum('ne,ehp->nhp', onehot,
                       e_kernel.astype(self.dtype))        # [N, hidden, part]
        b = jnp.einsum('ne,ep->np', onehot,
                       e_bias.astype(self.dtype))          # [N, part]
        part = jnp.einsum('nth,nhp->ntp', h, w,
                          preferred_element_type=F32_ACCUM)
        part = (part + b[:, None, :]).astype(self.dtype)
        return jnp.concatenate([shared, part], axis=-1)


class Attention(nn.Module):
    """Multi-head self-attention (reference vit.py:78).

    Single fused qkv projection; softmax in f32. With `fused=True` the
    core runs as one Pallas kernel per (batch, head) — QK^T, softmax, PV
    stay in VMEM (ops/attention.py); otherwise the plain einsum path lets
    XLA schedule it.
    """
    num_heads: int
    qkv_bias: bool = True
    fused: bool = False
    int8_qkv: bool = False
    int8_act_scales: Optional[tuple] = None   # (qkv_in, proj_in) absmax
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, t, d = x.shape
        head_dim = d // self.num_heads
        scale = head_dim ** -0.5
        if self.int8_qkv:
            aq, ap = (self.int8_act_scales or (None, None))[:2]
            qkv_layer = Int8Dense(3 * d, act_scale=aq,
                                  use_bias=self.qkv_bias, dtype=self.dtype,
                                  name='qkv')
            proj_layer = Int8Dense(d, act_scale=ap, dtype=self.dtype,
                                   name='proj')
        else:
            qkv_layer = nn.Dense(3 * d, use_bias=self.qkv_bias,
                                 dtype=self.dtype, name='qkv')
            proj_layer = nn.Dense(d, dtype=self.dtype, name='proj')
        qkv = qkv_layer(x)
        qkv = qkv.reshape(n, t, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]   # [N, T, H, hd]
        if self.fused:
            from ..ops.attention import attention as fused_attn
            out = fused_attn(q, k, v)
        else:
            attn = jnp.einsum('nqhd,nkhd->nhqk', q * scale, k,
                              preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum('nhqk,nkhd->nqhd', attn, v,
                             preferred_element_type=jnp.float32)
        out = out.reshape(n, t, d).astype(self.dtype)
        # under remat_policy='attn', this tensor is the one residual kept
        # per attention: the backward pass then rebuilds q/k/v with one
        # cheap qkv matmul instead of re-running the attention kernel
        from jax.ad_checkpoint import checkpoint_name
        out = checkpoint_name(out, 'attn_out')
        # record the proj input for utils/quantize.py calibration (no-op
        # unless 'intermediates' is mutable)
        self.sow('intermediates', 'proj_in', out)
        return proj_layer(out)


class Block(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    fused_attention: bool = False
    drop_path: float = 0.0
    num_experts: int = 0          # 0 => plain Mlp
    part_dim: int = 0
    gelu_approx: bool = False
    int8_mlp: bool = False
    int8_qkv: bool = False
    # per-block absmax: (fc1_in, fc2_in) or (fc1_in, fc2_in, qkv_in, proj_in)
    int8_act_scales: Optional[tuple] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, expert_idx=None):
        d = x.shape[-1]
        hidden = int(d * self.mlp_ratio)
        dp = DropPath(self.drop_path)
        scales = self.int8_act_scales or ()
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name='norm1')(x)
        y = Attention(self.num_heads, self.qkv_bias,
                      fused=self.fused_attention,
                      int8_qkv=self.int8_qkv,
                      int8_act_scales=(tuple(scales[2:4])
                                       if len(scales) >= 4 else None),
                      dtype=self.dtype,
                      name='attn')(y)
        x = x + dp(y, deterministic)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name='norm2')(x)
        if self.num_experts > 0:
            y = MoEMlp(hidden, d, self.num_experts, self.part_dim,
                       gelu_approx=self.gelu_approx, dtype=self.dtype,
                       name='mlp')(y, expert_idx)
        else:
            y = Mlp(hidden, d, gelu_approx=self.gelu_approx,
                    int8_mlp=self.int8_mlp,
                    int8_act_scales=self.int8_act_scales,
                    dtype=self.dtype, name='mlp')(y)
        return x + dp(y, deterministic)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: tuple = (256, 192)        # (H, W)
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    num_experts: int = 0                # >0 enables MoE FFN
    part_dim: int = 0
    remat_blocks: bool = False
    # what block-level remat keeps as residuals ('full' = nothing, the
    # torch gradient-checkpointing equivalent; 'attn' = keep each block's
    # attention output so backward re-runs only LN/qkv/MLP matmuls, never
    # the attention kernel forward; 'dots' = XLA policy keeping every
    # non-batch matmul output)
    remat_policy: str = 'full'
    fused_attention: bool = False       # Pallas attention kernel on TPU
    gelu_approx: bool = False           # tanh GELU (serving-time option)
    int8_mlp: bool = False              # W8A8 MLP matmuls (serving-time)
    int8_qkv: bool = False              # W8A8 qkv/proj matmuls too
    # static per-block activation absmax from utils/quantize.py: tuple of
    # (fc1_in, fc2_in) or (fc1_in, fc2_in, qkv_in, proj_in) tuples, one per
    # block; () => dynamic per-token
    int8_act_scales: tuple = ()
    # selective quantization: block indices kept bf16 even when
    # int8_mlp/int8_qkv are set (the first/last blocks carry the largest
    # per-instance OKS error — see PERF.md int8 selective sweep)
    int8_skip_blocks: tuple = ()
    dtype: str = 'float32'

    @property
    def grid(self):
        # conv pad 2 both sides, stride = patch (reference vit.py:157:
        # padding = 4 + 2*(ratio//2 - 1) = 2 for ratio=1)
        h = (self.img_size[0] + 4 - self.patch_size) // self.patch_size + 1
        w = (self.img_size[1] + 4 - self.patch_size) // self.patch_size + 1
        return h, w

    @property
    def num_patches(self):
        h, w = self.grid
        return h * w


# Model-zoo variants (reference configs: ViTPose_{small,base,large,huge}).
VIT_VARIANTS = {
    's': dict(embed_dim=384, depth=12, num_heads=12, drop_path_rate=0.1),
    'b': dict(embed_dim=768, depth=12, num_heads=12, drop_path_rate=0.3),
    'l': dict(embed_dim=1024, depth=24, num_heads=16, drop_path_rate=0.5),
    'h': dict(embed_dim=1280, depth=32, num_heads=16, drop_path_rate=0.55),
}


class ViT(nn.Module):
    """Window-free plain ViT backbone -> NHWC feature map.

    Input  [N, H, W, 3] -> output [N, Hp, Wp, D].
    """
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True, expert_idx=None):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        p = cfg.patch_size
        x = x.astype(dtype)
        x = nn.Conv(cfg.embed_dim, (p, p), strides=(p, p),
                    padding=((2, 2), (2, 2)), dtype=dtype,
                    name='patch_embed')(x)
        n, hp, wp, d = x.shape
        x = x.reshape(n, hp * wp, d)

        pos = self.param('pos_embed',
                         nn.initializers.truncated_normal(0.02),
                         (1, cfg.num_patches + 1, cfg.embed_dim))
        pos = pos.astype(dtype)
        # keep the cls-token slot additive, as the pretraining weights expect
        x = x + pos[:, 1:] + pos[:, :1]

        dpr = np.linspace(0.0, cfg.drop_path_rate, cfg.depth)
        block_cls = Block
        if cfg.remat_blocks:
            # `deterministic` must stay static under remat; flax counts the
            # module itself as argument 0, so it is index 2 (self, x,
            # deterministic). With index 1 the flag became a tracer and any
            # config with drop_path > 0 failed to trace.
            policy = None
            if cfg.remat_policy == 'attn':
                policy = jax.checkpoint_policies.save_only_these_names(
                    'attn_out')
            elif cfg.remat_policy == 'dots':
                policy = (jax.checkpoint_policies
                          .dots_with_no_batch_dims_saveable)
            elif cfg.remat_policy != 'full':
                raise ValueError(f'remat_policy {cfg.remat_policy!r}: '
                                 "expected 'full', 'attn', or 'dots'")
            block_cls = nn.remat(Block, static_argnums=(2,), policy=policy)
        skip8 = set(cfg.int8_skip_blocks or ())
        for i in range(cfg.depth):
            x = block_cls(
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias,
                fused_attention=cfg.fused_attention,
                drop_path=float(dpr[i]),
                num_experts=cfg.num_experts,
                part_dim=cfg.part_dim,
                gelu_approx=cfg.gelu_approx,
                int8_mlp=cfg.int8_mlp and i not in skip8,
                int8_qkv=cfg.int8_qkv and i not in skip8,
                int8_act_scales=(tuple(cfg.int8_act_scales[i])
                                 if cfg.int8_act_scales else None),
                dtype=dtype,
                name=f'blocks_{i}',
            )(x, deterministic, expert_idx)

        x = nn.LayerNorm(epsilon=1e-6, dtype=dtype, name='last_norm')(x)
        return x.reshape(n, hp, wp, d)


class HybridEmbed(nn.Module):
    """CNN-feature patch embedding (reference vit.py:168 `HybridEmbed`):
    run a CNN backbone, flatten its last feature map to tokens, project to
    the transformer width. Compose manually for hybrid ViTs:

        feat = HybridEmbed(backbone=ResNet(depth=18), embed_dim=768)(x)
        # feat [N, Hf*Wf, 768] -> feed Blocks directly
    """
    backbone: nn.Module
    embed_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = self.backbone(x, train=train)
        if isinstance(feat, (list, tuple)):
            feat = feat[-1]
        n, h, w, c = feat.shape
        feat = feat.reshape(n, h * w, c)
        return nn.Dense(self.embed_dim, dtype=self.dtype,
                        name='proj')(feat)

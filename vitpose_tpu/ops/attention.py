"""Fused multi-head self-attention as a Pallas TPU kernel.

ViTPose attention is short-sequence (192 tokens at 256x192, ~972 for the
576x432 G variant): per (batch, head) the whole [T, T] score matrix fits in
VMEM, so the kernel computes QK^T -> softmax -> PV in one pass without ever
materializing attention probabilities in HBM — the main memory-traffic cost
of the unfused XLA path. FLOPs run on the MXU with f32 accumulation; the
softmax runs in f32 on the VPU.

Grid: one program per (batch * head). Falls back to a pure-jnp
implementation off-TPU (`fused_attention(..., interpret=True)` is used in
CPU tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[...]                                   # [BB, T, d]
    k = k_ref[...]
    v = v_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # [BB, T, T] f32
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def fused_attention(q, k, v, scale=None, interpret=False, block=16):
    """q, k, v: [N, T, H, d] -> [N, T, H, d].

    One Pallas program per BLOCK of (batch*head) pairs — a batched
    QK^T/softmax/PV entirely in VMEM. Blocking multiple pairs per program
    amortizes grid-step overhead (measured ~12% on v5e vs one pair per
    program); larger blocks currently trip the Mosaic compiler at these
    shapes, 16 is the sweet spot.
    """
    from jax.experimental import pallas as pl

    n, t, h, d = q.shape
    if scale is None:
        scale = d ** -0.5

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(n * h, t, d)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)

    try:
        from jax.experimental.pallas import tpu as pltpu
        memory_space = pltpu.VMEM
    except ImportError:                              # pragma: no cover
        memory_space = None

    bb = block
    while (n * h) % bb:
        bb //= 2
    bb = max(bb, 1)

    spec = pl.BlockSpec((bb, t, d), lambda i: (i, 0, 0),
                        memory_space=memory_space)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((n * h, t, d), q.dtype),
        grid=(n * h // bb,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(qb, kb, vb)
    return out.reshape(n, h, t, d).transpose(0, 2, 1, 3)


def reference_attention(q, k, v, scale=None):
    """Plain-jnp attention (the XLA path), same layout as fused_attention."""
    d = q.shape[-1]
    if scale is None:
        scale = d ** -0.5
    s = jnp.einsum('nqhd,nkhd->nhqk', q * scale, k,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum('nhqk,nkhd->nqhd', p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                     *, scale):
    """Fused attention backward: recompute scores/probabilities in VMEM and
    emit dq/dk/dv without ever materializing the [T, T] probability tensor
    in HBM (the round-2 XLA-recompute VJP wrote it to HBM twice per block).

    Math (per (batch*head) slice; everything f32 on the MXU/VPU):
        s  = q k^T * scale        p  = softmax(s)
        dv = p^T g
        dp = g v^T
        ds = p * (dp - rowsum(dp * p))          # softmax VJP
        dq = ds k * scale         dk = ds^T q * scale
    """
    q = q_ref[...]                                   # [BB, T, d]
    k = k_ref[...]
    v = v_ref[...]
    g = g_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # [BB, T, T] f32
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    gf = g.astype(jnp.float32)
    # dv = p^T @ g : contract over the query axis (1)
    dv = jax.lax.dot_general(
        p, gf, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [BB, T, d]
    # dp = g @ v^T : contract over the feature axis
    dp = jax.lax.dot_general(
        gf, v.astype(jnp.float32), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [BB, T, T]
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # [BB, T, d]
    # dk = ds^T @ q : contract over the query axis (1)
    dk = jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def fused_attention_bwd(q, k, v, g, scale=None, interpret=False, block=8):
    """Pallas backward pass: (q, k, v, dO) [N, T, H, d] -> (dq, dk, dv).

    block=8 (vs the forward's 16): the backward holds four [BB, T, T] f32
    intermediates in VMEM (s/p/dp/ds) — at T=192 and BB=8 that is ~4.7 MB
    plus ~2.8 MB of [BB, T, d] operands, comfortably inside the ~16 MB
    VMEM; BB=16 would be borderline."""
    from jax.experimental import pallas as pl

    n, t, h, d = q.shape
    if scale is None:
        scale = d ** -0.5

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(n * h, t, d)

    qb, kb, vb, gb = to_bh(q), to_bh(k), to_bh(v), to_bh(g)

    try:
        from jax.experimental.pallas import tpu as pltpu
        memory_space = pltpu.VMEM
    except ImportError:                              # pragma: no cover
        memory_space = None

    bb = block
    while (n * h) % bb:
        bb //= 2
    bb = max(bb, 1)

    spec = pl.BlockSpec((bb, t, d), lambda i: (i, 0, 0),
                        memory_space=memory_space)
    shape = jax.ShapeDtypeStruct((n * h, t, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale),
        out_shape=(shape, shape, shape),
        grid=(n * h // bb,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        interpret=interpret,
    )(qb, kb, vb, gb)

    def from_bh(x):
        return x.reshape(n, h, t, d).transpose(0, 2, 1, 3)

    return from_bh(dq), from_bh(dk), from_bh(dv)


@jax.custom_vjp
def attention(q, k, v):
    """Differentiable fused attention: Pallas forward AND backward on TPU
    (flash-style in-VMEM recompute; the [T, T] probabilities never touch
    HBM in either direction), plain-XLA fallback elsewhere."""
    return _attention_fwd_impl(q, k, v)


def _attention_fwd_impl(q, k, v):
    if jax.default_backend() == 'tpu':
        try:
            return fused_attention(q, k, v)
        except Exception:                            # pragma: no cover
            return reference_attention(q, k, v)
    return reference_attention(q, k, v)


def _attention_fwd(q, k, v):
    return _attention_fwd_impl(q, k, v), (q, k, v)


def _attention_bwd(res, g):
    q, k, v = res
    if jax.default_backend() == 'tpu':
        try:
            return fused_attention_bwd(q, k, v, g)
        except Exception:                            # pragma: no cover
            pass
    _, vjp = jax.vjp(reference_attention, q, k, v)
    return vjp(g)


attention.defvjp(_attention_fwd, _attention_bwd)

"""Pallas fused attention: correctness vs the reference einsum path
(interpret mode on CPU), and gradient flow through the custom VJP."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitpose_tpu.ops.attention import (fused_attention, reference_attention,
                                       attention)


@pytest.mark.parametrize("shape", [(2, 192, 12, 64), (1, 48, 4, 32)])
def test_fused_matches_reference(shape):
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, shape, jnp.float32)
    k = jax.random.normal(kk, shape, jnp.float32)
    v = jax.random.normal(kv, shape, jnp.float32)
    ref = reference_attention(q, k, v)
    out = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_attention_grad_flows():
    rng = jax.random.PRNGKey(1)
    shape = (1, 16, 2, 8)
    q, k, v = (jax.random.normal(jax.random.fold_in(rng, i), shape)
               for i in range(3))

    def loss(q, k, v):
        return jnp.sum(attention(q, k, v) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda q, k, v:
                  jnp.sum(reference_attention(q, k, v) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape,dtype", [
    ((2, 192, 12, 64), jnp.float32),   # ViTPose-B real geometry
    ((2, 192, 16, 80), jnp.float32),   # ViTPose-H real geometry
    ((1, 48, 4, 32), jnp.float32),
    ((2, 192, 12, 64), jnp.bfloat16),  # training dtype
])
def test_fused_backward_matches_xla_vjp(shape, dtype):
    """The Pallas backward kernel (interpret mode on CPU) must produce the
    same (dq, dk, dv) as jax.vjp through the reference einsum path — this
    is the gradient-correctness gate for the TPU training fast path."""
    from vitpose_tpu.ops.attention import fused_attention_bwd
    rng = jax.random.PRNGKey(2)
    q, k, v, g = (jax.random.normal(jax.random.fold_in(rng, i), shape,
                                    dtype) for i in range(4))
    _, vjp = jax.vjp(reference_attention, q, k, v)
    ref = vjp(g)
    got = fused_attention_bwd(q, k, v, g, interpret=True)
    tol = dict(rtol=1e-4, atol=1e-4) if dtype == jnp.float32 \
        else dict(rtol=0.1, atol=0.05)
    for name, a, b in zip(('dq', 'dk', 'dv'), got, ref):
        assert a.dtype == b.dtype == dtype
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            err_msg=name, **tol)


def test_fused_backward_block_residue():
    """(n*h) not divisible by the default block: the block-size fallback
    loop must still cover every pair."""
    from vitpose_tpu.ops.attention import fused_attention_bwd
    shape = (1, 48, 6, 32)            # n*h = 6 -> bb falls to 2
    rng = jax.random.PRNGKey(3)
    q, k, v, g = (jax.random.normal(jax.random.fold_in(rng, i), shape)
                  for i in range(4))
    _, vjp = jax.vjp(reference_attention, q, k, v)
    ref = vjp(g)
    got = fused_attention_bwd(q, k, v, g, interpret=True)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_vit_with_fused_flag_cpu_fallback():
    """On CPU the `attention` wrapper falls back to the einsum path; the
    model must produce identical outputs with the flag on/off."""
    from vitpose_tpu.models.vit import ViT, ViTConfig
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 48, 3))
    cfg0 = ViTConfig(img_size=(64, 48), embed_dim=32, depth=2, num_heads=4)
    cfg1 = ViTConfig(img_size=(64, 48), embed_dim=32, depth=2, num_heads=4,
                     fused_attention=True)
    m0, m1 = ViT(cfg0), ViT(cfg1)
    v0 = m0.init(jax.random.PRNGKey(0), x)
    out0 = m0.apply(v0, x)
    out1 = m1.apply(v0, x)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               rtol=1e-5, atol=1e-5)

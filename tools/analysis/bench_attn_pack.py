"""Microbenchmark: can G-packing (batch, head) pairs into larger GEMMs
lift the attention batched-small-GEMM floor?

Hypothesis: the ~7 TFLOP/s attention-core rate (PERF.md round-2 note) is a
per-GEMM fixed overhead, not a bandwidth limit. If so, computing QK^T for
G pairs at once as one [G*S, D] x [D, G*S] GEMM — G^2 blocks of which only
the G diagonal ones are used (G x FLOP waste) — trades wasted MACs for
fewer, larger GEMMs and could come out ahead. Same idea for PV with a
block-diagonal probability matrix.

Variants measured at the serving shape (B=256, H=12, S=192, D=64, bf16),
L=12 chained applications (out feeds the next iteration's q/k/v — immune
to DCE/dedup) per dispatch:
  base      : plain batched einsum attention (XLA)
  xla_sdpa  : jax.nn.dot_product_attention
  pallas    : the shipped fused_attention kernel
  packG     : G-packed QK^T (diag-block extract), batched PV
  packG_full: G-packed QK^T AND block-diag-packed PV

Run on the real chip: python tools/analysis/bench_attn_pack.py
"""
import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    B, H, S, D = 256, 12, 192, 64
    L = 12
    ITERS = 5
    scale = D ** -0.5
    P = B * H

    def base_core(q, k, v):
        s = jnp.einsum('bhsd,bhtd->bhst', q, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum('bhst,bhtd->bhsd', p, v)

    def sdpa_core(q, k, v):
        return jax.nn.dot_product_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3)).transpose(0, 2, 1, 3)

    def pallas_core(q, k, v):
        from vitpose_tpu.ops.attention import fused_attention
        # fused_attention takes [N, T, H, d]
        return fused_attention(q.transpose(0, 2, 1, 3),
                               k.transpose(0, 2, 1, 3),
                               v.transpose(0, 2, 1, 3)).transpose(0, 2, 1, 3)

    def pack_core(q, k, v, g, full):
        # [B,H,S,D] -> [P/g, g, S, D]
        qp = q.reshape(P // g, g, S, D)
        kp = k.reshape(P // g, g, S, D)
        vp = v.reshape(P // g, g, S, D)
        qm = qp.reshape(P // g, g * S, D)
        km = kp.reshape(P // g, g * S, D)
        full_s = jnp.einsum('pmd,pnd->pmn', qm, km,
                            preferred_element_type=jnp.float32) * scale
        # extract diagonal blocks [P/g, g, S, S]
        blocks = full_s.reshape(P // g, g, S, g, S)
        diag = jnp.einsum('pgsht,gh->pgst', blocks,
                          jnp.eye(g, dtype=full_s.dtype))
        p = jax.nn.softmax(diag, axis=-1).astype(q.dtype)
        if full:
            # block-diagonal PV: [P/g, g*S, g*S] x [P/g, g*S, D]
            pbd = (p[:, :, :, None, :]
                   * jnp.eye(g, dtype=p.dtype)[None, :, None, :, None])
            pbd = pbd.reshape(P // g, g * S, g * S)
            out = jnp.einsum('pmn,pnd->pmd', pbd,
                             vp.reshape(P // g, g * S, D))
            return out.reshape(B, H, S, D)
        out = jnp.einsum('pgst,pgtd->pgsd', p, vp)
        return out.reshape(B, H, S, D)

    def chained(core):
        @jax.jit
        def run(q, k, v):
            def body(carry, _):
                q, k, v = carry
                o = core(q, k, v)
                # feed outputs forward; renormalize to keep values sane
                o = o / (jnp.max(jnp.abs(o)) + 1e-3)
                return (o, k + o * 1e-3, v + o * 1e-3), ()
            (o, _, _), _ = jax.lax.scan(body, (q, k, v), None, length=L)
            return jnp.sum(o.astype(jnp.float32))
        return run

    import sys
    rng = np.random.RandomState(0)
    variants = [('base', base_core), ('xla_sdpa', sdpa_core),
                ('pallas', pallas_core)]
    for g in (2, 4, 8):
        variants.append((f'pack{g}', functools.partial(pack_core, g=g,
                                                       full=False)))
    for g in (2, 4):
        variants.append((f'pack{g}_full', functools.partial(pack_core, g=g,
                                                            full=True)))
    if len(sys.argv) > 1:
        want = set(sys.argv[1].split(','))
        variants = [vv for vv in variants if vv[0] in want]

    flops_useful = 2 * 2 * P * S * S * D * L  # qk + pv, per dispatch
    print(f'shape B{B} H{H} S{S} D{D}, L={L} chained, bf16; '
          f'useful {flops_useful/1e12:.2f} TFLOP/dispatch')
    # device-resident distinct inputs, materialized BEFORE timing (the
    # host->device transfer of 226 MB/iter otherwise dominates)
    @jax.jit
    def make_inputs(seed):
        ks = jax.random.split(jax.random.PRNGKey(seed), 3)
        mk = lambda kk: jax.random.normal(kk, (B, H, S, D), jnp.bfloat16)
        return mk(ks[0]), mk(ks[1]), mk(ks[2])

    inputs = []
    for it in range(ITERS + 1):
        q, k, v = make_inputs(it)
        float(np.asarray(jnp.sum(q[0, 0, 0].astype(jnp.float32))))  # sync
        inputs.append((q, k, v))

    for name, core in variants:
        run = chained(core)
        times = []
        for it in range(ITERS + 1):
            q, k, v = inputs[it]
            t0 = time.perf_counter()
            r = run(q, k, v)
            float(np.asarray(r))  # host readback sync
            times.append(time.perf_counter() - t0)
        dt = sorted(times[1:])[len(times[1:]) // 2]
        print(f'{name:12s} {dt*1e3:8.2f} ms/dispatch   '
              f'{flops_useful/dt/1e12:6.1f} useful-TFLOP/s', flush=True)


if __name__ == '__main__':
    main()

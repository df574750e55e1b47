"""Decompose the bench.py serving-loop time into components on the real
chip: matmul ceiling, backbone (fused vs XLA attention), head, normalize,
decode, and dispatch overhead. Prints one json line per experiment.

Methodology matches bench.py: distinct inputs per timed iteration and a
tiny host readback as the synchronization point (block_until_ready is not
a reliable barrier on the remote-tunnel backend).
"""
import json
import sys
import time

sys.path.insert(0, '/root/repo')

BATCH = 256
GROUP = 4
WARMUP = 1
ITERS = 3


def timeit(name, fn, inputs, sync, work_per_iter, unit='imgs/sec'):
    for i in range(WARMUP):
        sync(fn(inputs[i]))
    t0 = time.perf_counter()
    for i in range(WARMUP, WARMUP + ITERS):
        sync(fn(inputs[i]))
    dt = time.perf_counter() - t0
    per_sec = work_per_iter * ITERS / dt
    print(json.dumps({'exp': name, 'per_sec': round(per_sec, 2),
                      'ms_per_iter': round(dt / ITERS * 1e3, 2),
                      'unit': unit}))
    return per_sec


def main():
    import dataclasses as dc
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vitpose_tpu.models import TopDownModel, make_config
    from vitpose_tpu.models.vit import ViT
    from vitpose_tpu.ops.decode import keypoints_from_heatmaps
    from vitpose_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD

    def sync(x):
        while isinstance(x, (tuple, list)):
            x = x[0]
        # reduce ON DEVICE, fetch one scalar (full-array readbacks crawl
        # through the ~60MB/s tunnel and would dominate the timing)
        return float(np.asarray(jnp.ravel(x)[0]))

    n_in = WARMUP + ITERS

    # 0) matmul ceiling: the MLP fc1 shape of ViT-B at batch 256
    m, k, n2 = BATCH * 192, 768, 3072
    mats = [(jax.random.normal(jax.random.PRNGKey(i), (m, k),
                               dtype=jnp.bfloat16),
             jax.random.normal(jax.random.PRNGKey(100 + i), (k, n2),
                               dtype=jnp.bfloat16))
            for i in range(n_in)]

    @jax.jit
    def mm(ab):
        a, b = ab
        # 8 chained matmuls to amortize dispatch
        x = a
        for _ in range(8):
            x = jax.lax.dot(x, b)[:, :k]
        return x
    flops = 8 * 2 * m * k * n2
    tf = timeit('matmul_ceiling', mm, mats, sync, flops / 1e12,
                unit='TFLOP/s')

    # model variants
    def build(fused):
        cfg = make_config('b', img_size=(256, 192), out_channels=17,
                          dtype='bfloat16')
        cfg = dc.replace(cfg, backbone=dc.replace(
            cfg.backbone, fused_attention=fused))
        model = TopDownModel(cfg)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 192, 3)))
        return model, ViT(cfg.backbone), variables

    model_f, vit_f, vars_f = build(True)
    model_x, vit_x, vars_x = build(False)

    imgs = [jax.random.randint(jax.random.PRNGKey(i),
                               (GROUP, BATCH, 256, 192, 3), 0, 255,
                               dtype=jnp.int32).astype(jnp.uint8)
            for i in range(n_in)]
    center = jnp.tile(jnp.asarray([[320.0, 240.0]]), (BATCH, 1))
    scale = jnp.tile(jnp.asarray([[1.2, 1.6]]), (BATCH, 1))

    def make_e2e(model, variables, with_decode=True, vit=None):
        # pass params as an ARGUMENT (closing over them ships the weights
        # inside the serialized program -> HTTP 413 on the remote compiler)
        @jax.jit
        def run_v(variables, g):
            def body(c, u8):
                x = u8.astype(jnp.float32) / 255.0
                x = (x - jnp.asarray(IMAGENET_MEAN)) \
                    / jnp.asarray(IMAGENET_STD)
                if vit is None:
                    hm = model.apply(variables, x, train=False)
                else:
                    hm = vit.apply(
                        {'params': variables['params']['backbone']}, x,
                        deterministic=True)
                if with_decode:
                    preds, mv = keypoints_from_heatmaps(
                        hm, center, scale, post_process='default',
                        use_udp=True)
                    return c, preds
                return c, hm[..., :1, :1] if hm.ndim == 4 else hm
            _, outs = jax.lax.scan(body, 0, g)
            return outs

        def run(g):
            return run_v(variables, g)
        return run

    work = GROUP * BATCH
    timeit('e2e_fused_decode', make_e2e(model_f, vars_f), imgs, sync, work)
    timeit('e2e_fused_nodecode',
           make_e2e(model_f, vars_f, with_decode=False), imgs, sync, work)
    timeit('backbone_fused',
           make_e2e(model_f, vars_f, with_decode=False, vit=vit_f),
           imgs, sync, work)
    timeit('backbone_xla_attn',
           make_e2e(model_x, vars_x, with_decode=False, vit=vit_x),
           imgs, sync, work)
    timeit('e2e_xla_decode', make_e2e(model_x, vars_x), imgs, sync, work)

    # dispatch overhead: same program, GROUP=1
    imgs1 = [x[:1] for x in imgs]
    timeit('e2e_fused_group1', make_e2e(model_f, vars_f), imgs1, sync,
           BATCH)

    # decode alone
    hms = [jax.random.normal(jax.random.PRNGKey(i),
                             (GROUP, BATCH, 17, 64, 48), dtype=jnp.float32)
           for i in range(n_in)]

    @jax.jit
    def dec(g):
        def body(c, hm):
            p, _ = keypoints_from_heatmaps(hm, center, scale,
                                           post_process='default',
                                           use_udp=True)
            return c, p
        _, outs = jax.lax.scan(body, 0, g)
        return outs
    timeit('decode_only', dec, hms, sync, work)


if __name__ == '__main__':
    main()

"""Training throughput: ViTPose-B 256x192 train step (bf16, remat, fused
attention, layer-decay AdamW) on one chip, steps scanned in groups so the
measurement amortizes dispatch latency like a real input-pipelined loop.

Prints one json line {imgs_per_sec, ms_per_step}.
"""
import json
import os
import sys
import time

sys.path.insert(0, '/root/repo')

VARIANT = os.environ.get('BENCH_VARIANT', 'b')
BATCH = int(os.environ.get('BENCH_BATCH', '64'))
GROUP = int(os.environ.get('BENCH_TRAIN_GROUP', '4'))
WARMUP = 1
ITERS = int(os.environ.get('BENCH_TRAIN_ITERS', '3'))


def main():
    import dataclasses as dc
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vitpose_tpu.models import TopDownModel, make_config
    from vitpose_tpu.train import (OptimConfig, layer_decay_adamw,
                                   create_train_state, make_train_step)

    remat = os.environ.get('BENCH_REMAT', '1') == '1'
    cfg = make_config(VARIANT, img_size=(256, 192), out_channels=17,
                      dtype='bfloat16', remat=remat)
    cfg = dc.replace(cfg, backbone=dc.replace(cfg.backbone,
                                              fused_attention=True))
    model = TopDownModel(cfg)
    rng = jax.random.PRNGKey(0)
    imgs0 = jnp.zeros((BATCH, 256, 192, 3), jnp.float32)
    ocfg = OptimConfig(base_lr=5e-4, num_layers=cfg.backbone.depth)
    init_params = model.init(rng, imgs0, train=False)['params']
    tx = layer_decay_adamw(init_params, ocfg, steps_per_epoch=1000)
    state = create_train_state(model, rng, imgs0, tx)
    step = make_train_step(model)

    def batches(i):
        k = jax.random.PRNGKey(i)
        return {
            'imgs': jax.random.normal(k, (GROUP, BATCH, 256, 192, 3),
                                      dtype=jnp.float32),
            'target': jax.random.uniform(k, (GROUP, BATCH, 17, 64, 48)),
            'target_weight': jnp.ones((GROUP, BATCH, 17), jnp.float32),
        }

    @jax.jit
    def run(state, group, rng):
        def body(carry, batch):
            st, r = carry
            r, sub = jax.random.split(r)
            st, metrics = step(st, batch, sub)
            return (st, r), metrics['heatmap_loss']
        (state, _), losses = jax.lax.scan(body, (state, rng), group)
        return state, losses

    def sync(x):
        return float(np.asarray(jnp.ravel(x)[0]))

    for i in range(WARMUP):
        state, losses = run(state, batches(i), jax.random.PRNGKey(i))
        sync(losses)
    t0 = time.perf_counter()
    for i in range(WARMUP, WARMUP + ITERS):
        state, losses = run(state, batches(i), jax.random.PRNGKey(i))
        sync(losses)
    dt = time.perf_counter() - t0
    ips = GROUP * BATCH * ITERS / dt
    print(json.dumps({'metric': f'vitpose_{VARIANT}_256x192_train',
                      'imgs_per_sec': round(ips, 1),
                      'ms_per_step': round(dt / (GROUP * ITERS) * 1e3, 1)}))


if __name__ == '__main__':
    main()

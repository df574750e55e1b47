"""BatchNorm semantics under the data mesh — DECIDED and pinned.

The deconv head's nn.BatchNorm, inside a jit whose batch is sharded over
the `data` axis, reduces mean/var over the GLOBAL logical batch (GSPMD
inserts the cross-replica collective): sync-BN. This deliberately deviates
from the reference's per-GPU local stats (`broadcast_buffers=False`,
reference apis/train.py:131) — see vitpose_tpu/models/heads.py module
docstring and docs/parallelism.md for the rationale.

This test pins the behavior: the batch_stats produced by the 8-way-sharded
train step equal the stats of an UNSHARDED step over the same global batch
(and differ from any single shard's local stats).
"""
import numpy as np

import jax
import jax.numpy as jnp
import optax

from vitpose_tpu.models import TopDownModel, make_config
from vitpose_tpu.train.step import make_train_step
from vitpose_tpu.train.state import create_train_state
from vitpose_tpu.parallel.mesh import make_mesh, shard_train_step


def _global_batch(n=16):
    rng = np.random.RandomState(0)
    # per-shard distinct distributions so local stats differ measurably:
    # shard i's images are offset by i
    imgs = rng.rand(n, 64, 48, 3).astype(np.float32)
    shard_ids = np.repeat(np.arange(8), n // 8)
    imgs += shard_ids[:, None, None, None].astype(np.float32)
    target = rng.rand(n, 5, 16, 12).astype(np.float32)
    weight = np.ones((n, 5), np.float32)
    return dict(imgs=imgs, target=jnp.asarray(target),
                target_weight=jnp.asarray(weight))


def _bn_means(state):
    return jax.tree.map(np.asarray, state.batch_stats)


def test_bn_stats_are_global_batch_under_mesh():
    assert jax.device_count() >= 8, 'conftest sets an 8-device CPU mesh'
    cfg = make_config('s', img_size=(64, 48), out_channels=5)
    cfg = cfg.__class__(**{**cfg.__dict__, 'deconv_filters': (16, 16)})
    model = TopDownModel(cfg)
    batch = _global_batch(16)
    rng = jax.random.PRNGKey(0)
    tx = optax.sgd(0.0)   # zero LR: isolate the BN-statistics update

    step = make_train_step(model)

    # --- unsharded global-batch step (the semantics oracle) -------------
    state0 = create_train_state(model, rng, jnp.asarray(batch['imgs']), tx)
    sA, _ = jax.jit(step)(state0, jax.tree.map(jnp.asarray, batch), rng)
    statsA = _bn_means(sA)

    # --- 8-way data-sharded step on the same global batch ---------------
    mesh = make_mesh(n_data=8)
    state1 = create_train_state(model, rng, jnp.asarray(batch['imgs']), tx)
    jitted, sharded_state, place_batch = shard_train_step(
        step, mesh, state1, batch)
    sB, _ = jitted(sharded_state, place_batch(batch), rng)
    statsB = _bn_means(sB)

    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(statsA)[0],
            jax.tree_util.tree_flatten_with_path(statsB)[0]):
        assert pa == pb
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5,
                                   err_msg=f'sync-BN violated at {pa}')

    # --- and global stats differ from any single shard's local stats ----
    local = dict(batch)
    local_imgs = batch['imgs'][:2]          # shard 0's slice
    local.update(imgs=local_imgs, target=batch['target'][:2],
                 target_weight=batch['target_weight'][:2])
    state2 = create_train_state(model, rng, jnp.asarray(local_imgs), tx)
    sC, _ = jax.jit(step)(state2, jax.tree.map(jnp.asarray, local), rng)
    statsC = _bn_means(sC)
    diffs = [float(np.abs(a - c).max()) for (_, a), (_, c) in zip(
        jax.tree_util.tree_flatten_with_path(statsA)[0],
        jax.tree_util.tree_flatten_with_path(statsC)[0])]
    assert max(diffs) > 1e-3, \
        'fixture too weak: local and global BN stats coincide'

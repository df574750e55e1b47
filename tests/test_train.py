"""Training stack tests: optimizer rules, overfit smoke, sharded step."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitpose_tpu.models import TopDownModel, make_config
from vitpose_tpu.models.vit import ViTConfig
from vitpose_tpu.train import (OptimConfig, layer_decay_adamw,
                               make_lr_schedule, create_train_state,
                               make_train_step, make_moe_train_step)
from vitpose_tpu.train.optim import layer_id_for_path, _lr_scale_tree
from vitpose_tpu.parallel import make_mesh, shard_train_step


def tiny_model(moe=False):
    # 4 experts: divisible by the 2-device expert mesh axis in the
    # sharding test (ViTPose+ uses 6)
    cfg = make_config('s', img_size=(64, 48), out_channels=5,
                      num_experts=4 if moe else 0, part_dim=8 if moe else 0)
    cfg = cfg.__class__(**{**cfg.__dict__,
                           'backbone': ViTConfig(
                               img_size=(64, 48), embed_dim=32, depth=2,
                               num_heads=4,
                               num_experts=4 if moe else 0,
                               part_dim=8 if moe else 0),
                           'deconv_filters': (16, 16),
                           'num_extra_heads': 2 if moe else 0,
                           'extra_head_channels': (5, 5) if moe else ()})
    return TopDownModel(cfg)


def make_batch(n=4, k=5, hm=(16, 12)):
    rng = np.random.RandomState(0)
    target = np.zeros((n, k, hm[0], hm[1]), np.float32)
    for i in range(n):
        for j in range(k):
            y, x = rng.randint(2, hm[0] - 2), rng.randint(2, hm[1] - 2)
            target[i, j, y, x] = 1.0
    return {
        'imgs': jnp.asarray(rng.randn(n, 64, 48, 3).astype(np.float32)),
        'target': jnp.asarray(target),
        'target_weight': jnp.ones((n, k), jnp.float32),
    }


def test_layer_id_rules():
    depth = 12
    assert layer_id_for_path(('backbone', 'pos_embed'), depth) == 0
    assert layer_id_for_path(('backbone', 'patch_embed', 'kernel'),
                             depth) == 0
    assert layer_id_for_path(('backbone', 'blocks_0', 'attn', 'qkv',
                              'kernel'), depth) == 1
    assert layer_id_for_path(('backbone', 'blocks_11', 'mlp', 'fc2',
                              'kernel'), depth) == 12
    assert layer_id_for_path(('backbone', 'last_norm', 'scale'), depth) == 13
    assert layer_id_for_path(('head', 'final', 'kernel'), depth) == 13


def test_lr_scales_match_reference_rule():
    params = {'backbone': {'pos_embed': jnp.zeros((1, 4, 8)),
                           'blocks_0': {'attn': {'qkv': {
                               'kernel': jnp.zeros((8, 24))}}}},
              'head': {'final': {'kernel': jnp.zeros((1, 1, 8, 5))}}}
    scales = _lr_scale_tree(params, depth=12, rate=0.75)
    # num_layers = 14; scale = 0.75^(13 - layer_id)
    assert np.isclose(scales['backbone']['pos_embed'], 0.75 ** 13)
    assert np.isclose(
        scales['backbone']['blocks_0']['attn']['qkv']['kernel'], 0.75 ** 12)
    assert np.isclose(scales['head']['final']['kernel'], 1.0)


def test_lr_schedule():
    cfg = OptimConfig(base_lr=5e-4, warmup_iters=500,
                      decay_epochs=(170, 200))
    sched = make_lr_schedule(cfg, steps_per_epoch=100)
    assert np.isclose(float(sched(0)), 5e-4 * 1e-3, rtol=1e-3)
    assert np.isclose(float(sched(500)), 5e-4)
    assert np.isclose(float(sched(17000 - 1)), 5e-4)
    assert np.isclose(float(sched(17001)), 5e-5)
    assert np.isclose(float(sched(20001)), 5e-6)


def test_overfit_smoke():
    model = tiny_model()
    batch = make_batch()
    cfg = OptimConfig(base_lr=1e-3, warmup_iters=1, num_layers=2,
                      grad_clip_norm=1.0)
    rng = jax.random.PRNGKey(0)
    variables_rng, step_rng = jax.random.split(rng)
    tx = layer_decay_adamw(
        model.init(variables_rng, batch['imgs'], train=False)['params'],
        cfg, steps_per_epoch=10 ** 6)
    state = create_train_state(model, variables_rng, batch['imgs'], tx)
    step = jax.jit(make_train_step(model))
    losses = []
    for i in range(30):
        state, metrics = step(state, batch, jax.random.fold_in(step_rng, i))
        losses.append(float(metrics['heatmap_loss']))
    assert losses[-1] < losses[0] * 0.5, losses[::5]
    assert np.isfinite(losses).all()


def test_moe_train_step():
    model = tiny_model(moe=True)
    batch = make_batch()
    batch['dataset_idx'] = jnp.array([0, 1, 2, 0])
    cfg = OptimConfig(base_lr=1e-3, warmup_iters=1, num_layers=2)
    rng = jax.random.PRNGKey(0)
    tx = layer_decay_adamw(
        model.init(rng, batch['imgs'], train=False, all_heads=True,
                   expert_idx=jnp.zeros(4, jnp.int32))['params'],
        cfg, steps_per_epoch=10 ** 6)
    state = create_train_state(model, rng, batch['imgs'], tx,
                               expert_idx=jnp.zeros(4, jnp.int32))
    step = jax.jit(make_moe_train_step(model, num_datasets=3))
    state, metrics = step(state, batch, rng)
    assert np.isfinite(float(metrics['heatmap_loss']))
    assert 'loss_0' in metrics and 'loss_2' in metrics


def test_sharded_train_step_8_devices():
    assert jax.device_count() >= 8, "conftest should provide 8 cpu devices"
    model = tiny_model(moe=True)
    batch = make_batch(n=8)
    batch['dataset_idx'] = jnp.arange(8, dtype=jnp.int32) % 3
    cfg = OptimConfig(base_lr=1e-3, warmup_iters=1, num_layers=2)
    rng = jax.random.PRNGKey(0)
    init_expert = jnp.zeros(8, jnp.int32)
    tx = layer_decay_adamw(
        model.init(rng, batch['imgs'], train=False, all_heads=True,
                   expert_idx=init_expert)['params'],
        cfg, steps_per_epoch=10 ** 6)
    state = create_train_state(model, rng, batch['imgs'], tx,
                               expert_idx=init_expert)

    # single-device result FIRST (the sharded step donates its state, which
    # can alias these buffers)
    step1 = jax.jit(make_moe_train_step(model, num_datasets=3))
    _, metrics1 = step1(state, batch, rng)
    ref_loss = float(metrics1['heatmap_loss'])

    mesh = make_mesh(n_data=4, n_expert=2)
    step = make_moe_train_step(model, num_datasets=3)
    jitted, sharded_state, place_batch = shard_train_step(
        step, mesh, state, batch)
    sharded_state, metrics = jitted(sharded_state, place_batch(batch), rng)
    assert np.isfinite(float(metrics['heatmap_loss']))

    # expert kernels actually sharded over the expert axis
    ek = sharded_state.params['backbone']['blocks_0']['mlp']['expert_kernel']
    assert len(ek.sharding.spec) >= 1 and ek.sharding.spec[0] == 'expert'

    # sharded result equals single-device result
    np.testing.assert_allclose(float(metrics['heatmap_loss']), ref_loss,
                               rtol=1e-5)


def test_tensor_parallel_ffn_train_step():
    """Megatron-style FFN tensor parallelism over the `model` mesh axis:
    fc1 sharded on hidden-out, fc2 on hidden-in (XLA inserts the psum),
    MoE expert tensors on (expert, model). The TP result must equal the
    single-device result."""
    assert jax.device_count() >= 8
    model = tiny_model(moe=True)
    batch = make_batch(n=8)
    batch['dataset_idx'] = jnp.arange(8, dtype=jnp.int32) % 3
    cfg = OptimConfig(base_lr=1e-3, warmup_iters=1, num_layers=2)
    rng = jax.random.PRNGKey(0)
    init_expert = jnp.zeros(8, jnp.int32)
    tx = layer_decay_adamw(
        model.init(rng, batch['imgs'], train=False, all_heads=True,
                   expert_idx=init_expert)['params'],
        cfg, steps_per_epoch=10 ** 6)
    state = create_train_state(model, rng, batch['imgs'], tx,
                               expert_idx=init_expert)

    step1 = jax.jit(make_moe_train_step(model, num_datasets=3))
    _, metrics1 = step1(state, batch, rng)
    ref_loss = float(metrics1['heatmap_loss'])

    mesh = make_mesh(n_data=2, n_expert=1, n_model=4)
    assert mesh.shape == {'data': 2, 'expert': 1, 'model': 4}
    step = make_moe_train_step(model, num_datasets=3)
    jitted, sharded_state, place_batch = shard_train_step(
        step, mesh, state, batch)
    sharded_state, metrics = jitted(sharded_state, place_batch(batch), rng)

    blk = sharded_state.params['backbone']['blocks_0']['mlp']
    assert blk['fc1']['kernel'].sharding.spec == ('model',) or \
        tuple(blk['fc1']['kernel'].sharding.spec) == (None, 'model')
    assert tuple(blk['fc2']['kernel'].sharding.spec) == ('model', None) or \
        tuple(blk['fc2']['kernel'].sharding.spec) == ('model',)

    np.testing.assert_allclose(float(metrics['heatmap_loss']), ref_loss,
                               rtol=1e-5)


def test_zero1_optimizer_state_sharding():
    """ZeRO-1: adam moments shard over the data axis (memory spread across
    the dp group); the training result is unchanged."""
    assert jax.device_count() >= 8
    model = tiny_model(moe=True)
    batch = make_batch(n=8)
    batch['dataset_idx'] = jnp.arange(8, dtype=jnp.int32) % 3
    cfg = OptimConfig(base_lr=1e-3, warmup_iters=1, num_layers=2)
    rng = jax.random.PRNGKey(0)
    init_expert = jnp.zeros(8, jnp.int32)
    tx = layer_decay_adamw(
        model.init(rng, batch['imgs'], train=False, all_heads=True,
                   expert_idx=init_expert)['params'],
        cfg, steps_per_epoch=10 ** 6)
    state = create_train_state(model, rng, batch['imgs'], tx,
                               expert_idx=init_expert)

    step1 = jax.jit(make_moe_train_step(model, num_datasets=3))
    state_ref, metrics1 = step1(state, batch, rng)
    ref_loss = float(metrics1['heatmap_loss'])

    mesh = make_mesh(n_data=8, n_expert=1)
    step = make_moe_train_step(model, num_datasets=3)
    jitted, sharded_state, place_batch = shard_train_step(
        step, mesh, state, batch, zero1=True)

    # at least one optimizer-moment leaf is sharded over `data`
    leaves = jax.tree.leaves(sharded_state.opt_state)
    assert any('data' in tuple(getattr(l.sharding, 'spec', ()) or ())
               for l in leaves if hasattr(l, 'sharding')), \
        'no ZeRO-sharded optimizer leaf found'

    new_state, metrics = jitted(sharded_state, place_batch(batch), rng)
    np.testing.assert_allclose(float(metrics['heatmap_loss']), ref_loss,
                               rtol=1e-5)
    # the UPDATED state (params and adam moments) matches the
    # replicated-optimizer step numerically, leaf by leaf — ZeRO-1 is a
    # memory layout, not a different optimizer (VERDICT r4 #5)
    for zl, rl in zip(jax.tree.leaves(new_state.params),
                      jax.tree.leaves(state_ref.params)):
        np.testing.assert_allclose(np.asarray(zl), np.asarray(rl),
                                   rtol=1e-5, atol=1e-6)
    for zl, rl in zip(jax.tree.leaves(new_state.opt_state),
                      jax.tree.leaves(state_ref.opt_state)):
        np.testing.assert_allclose(np.asarray(zl), np.asarray(rl),
                                   rtol=1e-5, atol=1e-6)


def test_zero1_layout_stable_across_steps():
    """With zero1=True the returned state must keep the COMMITTED layout
    (params replicated, moments data-sharded): without out_shardings XLA
    returned data-sharded params after step 1, flipping the layout and
    recompiling on step 2 (review finding, verified)."""
    assert jax.device_count() >= 8
    model = tiny_model(moe=True)
    batch = make_batch(n=8)
    batch['dataset_idx'] = jnp.arange(8, dtype=jnp.int32) % 3
    cfg = OptimConfig(base_lr=1e-3, warmup_iters=1, num_layers=2)
    rng = jax.random.PRNGKey(0)
    init_expert = jnp.zeros(8, jnp.int32)
    init_vars = model.init(rng, batch['imgs'], train=False, all_heads=True,
                           expert_idx=init_expert)
    tx = layer_decay_adamw(init_vars['params'], cfg, steps_per_epoch=10**6)
    state = create_train_state(model, rng, batch['imgs'], tx,
                               variables=init_vars)

    mesh = make_mesh(n_data=8, n_expert=1)
    step = make_moe_train_step(model, num_datasets=3)
    jitted, sharded_state, place_batch = shard_train_step(
        step, mesh, state, batch, zero1=True)

    committed = [l.sharding for l in jax.tree.leaves(sharded_state.params)]
    s1, _ = jitted(sharded_state, place_batch(batch), rng)
    after1 = [l.sharding for l in jax.tree.leaves(s1.params)]
    assert committed == after1, 'params layout changed across the step'
    # every param stays replicated (no silent ZeRO-3 flip)
    assert all(tuple(sh.spec) == () for sh in after1)
    # and a second step runs with the same layout (no re-trace crash)
    s2, _ = jitted(s1, place_batch(batch), rng)
    assert [l.sharding for l in jax.tree.leaves(s2.params)] == committed


def test_freeze_tx_composes_with_layer_decay():
    """freeze_tx(multi_transform) prunes the update tree per partition;
    layer_decay_adamw's lr-scale stage must tolerate that (path-keyed
    lookup) instead of crashing on structure mismatch (review finding,
    reproduced with optax 0.2.x)."""
    from vitpose_tpu.train.optim import (freeze_tx, make_freeze_mask,
                                         layer_decay_adamw, OptimConfig)
    model = tiny_model()
    rng = jax.random.PRNGKey(0)
    imgs = jnp.zeros((2, 64, 48, 3))
    params = model.init(rng, imgs, train=False)['params']
    cfg = OptimConfig(base_lr=1e-3, warmup_iters=1, num_layers=2)
    tx = freeze_tx(layer_decay_adamw(params, cfg, steps_per_epoch=10),
                   make_freeze_mask(params, frozen_stages=1))
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    flat = jax.tree_util.tree_flatten_with_path(updates)[0]
    frozen = [u for p, u in flat
              if any('blocks_1' == getattr(k, 'key', '') for k in p)]
    live = [u for p, u in flat
            if any('head' == getattr(k, 'key', '') for k in p)]
    assert frozen and all(np.allclose(u, 0) for u in frozen)
    assert live and any(not np.allclose(u, 0) for u in live)

"""Aux-family data parallelism: data_parallel_step (parallel/mesh.py)
must produce exactly the single-device result (the gradient psum over the
`data` axis is semantics-preserving), and the aux loops must accept the
same mesh config as the flagship (runtime.n_data)."""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from vitpose_tpu.parallel.mesh import make_mesh, data_parallel_step


def test_data_parallel_step_matches_single_device():
    assert jax.device_count() >= 8
    tx = optax.sgd(0.1)

    def step(params, opt_state, x, y):
        def loss_fn(p):
            return jnp.mean((x @ p - y) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(0)
    params = jnp.asarray(rng.randn(6).astype(np.float32))
    x = rng.randn(16, 6).astype(np.float32)
    y = rng.randn(16).astype(np.float32)
    opt_state = tx.init(params)

    ref_p, _, ref_loss = jax.jit(step)(params, opt_state,
                                       jnp.asarray(x), jnp.asarray(y))

    mesh = make_mesh(n_data=8)
    jitted, place_batch = data_parallel_step(step, mesh, n_args=4,
                                             batch_argnums={2, 3})
    xb = place_batch(x)
    yb = place_batch(y)
    assert 'data' in str(xb.sharding.spec)
    got_p, _, got_loss = jitted(params, tx.init(params), xb, yb)
    # outputs pinned replicated
    assert got_p.sharding.is_fully_replicated
    np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(ref_p),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_bottomup_step_sharded_matches_unsharded():
    """The real bottom-up AE train step through data_parallel_step on the
    8-device mesh equals the plain jit step (params, BN stats, metrics)."""
    import flax.linen as nn
    from vitpose_tpu.data.bottomup import BottomUpCocoDataset
    from vitpose_tpu.data import DatasetInfo
    from vitpose_tpu.models.bottomup import BottomUpEstimator
    from vitpose_tpu.train.bottomup_loop import (
        BottomUpLoader, make_bottomup_train_step, split_bottomup_variables)

    REF = "/root/reference/tests/data/coco"

    class TinyBackbone(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.relu(nn.Conv(8, (3, 3), strides=(2, 2))(x))
            x = nn.BatchNorm(use_running_average=not train)(x)
            return nn.relu(nn.Conv(16, (3, 3), strides=(2, 2))(x))

    ds = BottomUpCocoDataset(f"{REF}/test_coco.json", REF + "/",
                             input_size=64, output_sizes=(16,),
                             max_people=10)
    ds.info = DatasetInfo.load('coco')
    loader = BottomUpLoader(ds, batch_size=4, output_sizes=(16,),
                            sigma=1.0)
    batch = jax.tree.map(np.asarray, next(iter(loader)))

    est = BottomUpEstimator(TinyBackbone(), num_joints=17,
                            dataset_info=ds.info)
    rng = jax.random.PRNGKey(0)
    variables = est.init(rng, jnp.zeros((1, 64, 64, 3)))
    params, stats = split_bottomup_variables(variables)
    # sgd, not adam: adam's first step is ~lr*sign(grad), which amplifies
    # f32 reduction-order noise into full-size update flips where grad~0
    tx = optax.sgd(0.1)
    opt_state = tx.init(params)
    _, train_step = make_bottomup_train_step(est)
    stepf = functools.partial(train_step, tx=tx)

    p_ref, s_ref, _, m_ref = jax.jit(stepf)(
        params, stats, opt_state, jax.tree.map(jnp.asarray, batch))

    mesh = make_mesh(n_data=4, devices=jax.devices()[:4])
    jitted, place_batch = data_parallel_step(stepf, mesh, n_args=4,
                                             batch_argnums={3})
    p_got, s_got, _, m_got = jitted(params, stats, tx.init(params),
                                    place_batch(batch))
    np.testing.assert_allclose(float(m_got['total_loss']),
                               float(m_ref['total_loss']), rtol=1e-5)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(jax.tree.map(np.asarray,
                                                              p_ref))[0],
            jax.tree_util.tree_flatten_with_path(jax.tree.map(np.asarray,
                                                              p_got))[0]):
        assert pa == pb
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=1e-5,
                                   err_msg=str(pa))
    # BN stats: sync-BN — sharded step reduces over the global batch,
    # so they match the unsharded step exactly (same global statistics)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(jax.tree.map(np.asarray,
                                                              s_ref))[0],
            jax.tree_util.tree_flatten_with_path(jax.tree.map(np.asarray,
                                                              s_got))[0]):
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-6,
                                   err_msg=str(pa))


@pytest.mark.slow
def test_lifter_loop_trains_on_mesh(tmp_path):
    """train_pose_lifter_model accepts runtime.n_data like the flagship
    and runs its sharded step."""
    from vitpose_tpu.train.lifter_loop import train_pose_lifter_model
    h36m = "/root/reference/tests/data/h36m"
    cfg = dict(
        model=dict(family='pose_lifter', num_joints=17,
                   stem_channels=32, kernel_sizes=(3, 3)),
        data=dict(dataset='h36m', seq_len=9, batch_size=8, flip_aug=False,
                  train=dict(ann_file=f'{h36m}/test_h36m_body3d.npz')),
        optimizer=dict(base_lr=1e-3, total_epochs=1),
        runtime=dict(n_data=8, work_dir=str(tmp_path)),
        evaluation=dict(interval=0),
        seed=0,
    )
    variables, metrics = train_pose_lifter_model(cfg, work_dir=str(tmp_path),
                                                 max_steps=2)
    assert np.isfinite(float(metrics['mpjpe_loss']))


@pytest.mark.slow
def test_mesh_adversarial_step_sharded_matches_unsharded():
    """The two-optimizer adversarial step (generator + discriminator)
    through data_parallel_step equals the plain jit step — BOTH gradient
    psums (gen and disc) must be semantics-preserving."""
    from vitpose_tpu.models.mesh import (SMPLDiscriminator, ParametricMesh,
                                         make_adversarial_train_step,
                                         linear_smpl_fn)
    from vitpose_tpu.models.resnet import ResNet

    rng = np.random.RandomState(3)
    B = 4
    batch = dict(
        imgs=rng.rand(B, 64, 64, 3).astype(np.float32),
        joints_2d=rng.rand(B, 24, 2).astype(np.float32) * 64,
        joints_2d_visible=np.ones((B, 24), np.float32),
        joints_3d=rng.randn(B, 24, 3).astype(np.float32),
        joints_3d_visible=np.ones((B, 24), np.float32),
        real_pose=rng.randn(B, 72).astype(np.float32) * 0.1,
        real_shape=rng.randn(B, 10).astype(np.float32) * 0.1,
    )
    key = jax.random.PRNGKey(0)
    mesh_model = ParametricMesh(ResNet(depth=18), linear_smpl_fn(),
                                num_iters=2)
    disc = SMPLDiscriminator(hidden=32)
    gen_vars = mesh_model.init(key, jnp.asarray(batch['imgs']))
    disc_vars = disc.init(key, jnp.zeros((B, 72)), jnp.zeros((B, 10)))
    # sgd: adam's sign-like first step amplifies f32 reduction-order noise
    gen_tx, disc_tx = optax.sgd(1e-3), optax.sgd(1e-4)
    step = make_adversarial_train_step(mesh_model, disc, gen_tx, disc_tx)

    jb = jax.tree.map(jnp.asarray, batch)
    g_ref, d_ref, _, _, m_ref = jax.jit(step)(
        gen_vars, disc_vars, gen_tx.init(gen_vars),
        disc_tx.init(disc_vars), jb)

    mesh = make_mesh(n_data=4, devices=jax.devices()[:4])
    jitted, place_batch = data_parallel_step(step, mesh, n_args=5,
                                             batch_argnums={4})
    g_got, d_got, _, _, m_got = jitted(
        gen_vars, disc_vars, gen_tx.init(gen_vars),
        disc_tx.init(disc_vars), place_batch(batch))
    np.testing.assert_allclose(float(m_got['gen_loss']),
                               float(m_ref['gen_loss']), rtol=1e-5)
    np.testing.assert_allclose(float(m_got['disc_loss']),
                               float(m_ref['disc_loss']), rtol=1e-5)
    for tree_ref, tree_got, label in ((g_ref, g_got, 'gen'),
                                      (d_ref, d_got, 'disc')):
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_flatten_with_path(
                    jax.tree.map(np.asarray, tree_ref))[0],
                jax.tree_util.tree_flatten_with_path(
                    jax.tree.map(np.asarray, tree_got))[0]):
            assert pa == pb
            # atol 3e-5: f32 reduction-order noise through two chained
            # optimizer updates (gen then disc)
            np.testing.assert_allclose(b, a, rtol=2e-4, atol=3e-5,
                                       err_msg=f'{label}:{pa}')


@pytest.mark.slow
def test_interhand_loop_trains_on_mesh(tmp_path):
    """train_model('interhand3d') accepts runtime.n_data like the
    flagship and runs its sharded step."""
    from vitpose_tpu.train.loop import train_model
    REF = "/root/reference/tests/data/interhand2.6m"
    cfg = dict(
        model=dict(family='interhand3d', backbone_type='resnet',
                   backbone_overrides=dict(depth=18), num_joints=42,
                   depth_size=8),
        data=dict(
            dataset='interhand3d', image_size=(64, 64),
            heatmap_size=(8, 8), batch_size=4,
            train=dict(
                ann_file=f"{REF}/test_interhand2.6m_data.json",
                camera_file=f"{REF}/test_interhand2.6m_camera.json",
                joint_file=f"{REF}/test_interhand2.6m_joint_3d.json",
                img_prefix=REF + "/")),
        target=dict(depth_bound=400.0, root_depth_bins=16,
                    root_depth_bound=400.0, sigma=1.5),
        optimizer=dict(base_lr=1e-3, total_epochs=1),
        runtime=dict(n_data=4, work_dir=str(tmp_path)),
    )
    variables, metrics = train_model(cfg, max_steps=2)
    assert all(np.isfinite(v) for v in metrics.values())

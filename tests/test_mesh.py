"""Mesh (SMPL) family: HMR head, discriminator, adversarial training with a
mock SMPL function (real SMPL assets are external)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from vitpose_tpu.models.mesh import (HMRMeshHead, SMPLDiscriminator,
                                     ParametricMesh,
                                     make_adversarial_train_step,
                                     project_points, POSE_DIM, SHAPE_DIM)
from vitpose_tpu.models.resnet import ResNet


def mock_smpl(pose, shape):
    """Linear mock: deterministic vertices/joints from params."""
    n = pose.shape[0]
    w_j = jnp.asarray(np.random.RandomState(0).randn(
        POSE_DIM + SHAPE_DIM, 24 * 3).astype(np.float32)) * 0.01
    params = jnp.concatenate([pose, shape], axis=-1)
    joints = (params @ w_j).reshape(n, 24, 3)
    verts = jnp.tile(joints[:, :1], (1, 40, 1))
    return verts, joints


def test_hmr_head_iterative():
    head = HMRMeshHead(num_iters=3, hidden=64)
    feat = jnp.ones((2, 128))
    v = head.init(jax.random.PRNGKey(0), feat, train=False)
    pose, shape, cam = head.apply(v, feat, train=False)
    assert pose.shape == (2, 72) and shape.shape == (2, 10)
    assert cam.shape == (2, 3)


def test_discriminator_logits():
    disc = SMPLDiscriminator(hidden=64)
    pose = jnp.zeros((3, 72))
    shape = jnp.zeros((3, 10))
    v = disc.init(jax.random.PRNGKey(0), pose, shape)
    out = disc.apply(v, pose, shape)
    assert out.shape == (3, 25)         # 23 joints + shape + full pose


def test_projection():
    joints = jnp.ones((2, 24, 3))
    cam = jnp.asarray([[2.0, 0.1, -0.1], [1.0, 0.0, 0.0]])
    p = project_points(joints, cam)
    assert p.shape == (2, 24, 2)
    np.testing.assert_allclose(np.asarray(p)[0, 0], [2.1, 1.9], atol=1e-5)


@pytest.mark.slow
def test_adversarial_training_step():
    rng = jax.random.PRNGKey(0)
    mesh = ParametricMesh(ResNet(depth=18), mock_smpl, num_iters=2)
    disc = SMPLDiscriminator(hidden=32)
    imgs = jax.random.normal(rng, (2, 64, 48, 3))
    gen_vars = mesh.init(rng, imgs)
    disc_vars = disc.init(rng, jnp.zeros((2, 72)), jnp.zeros((2, 10)))
    gen_tx, disc_tx = optax.adam(1e-4), optax.adam(1e-4)
    gen_opt = gen_tx.init(gen_vars)
    disc_opt = disc_tx.init(disc_vars)

    gt_pose = jnp.zeros((2, 72))
    gt_shape = jnp.zeros((2, 10))
    _, gt_joints = mock_smpl(gt_pose, gt_shape)
    batch = dict(
        imgs=imgs,
        joints_3d=gt_joints,
        joints_3d_visible=jnp.ones((2, 24)),
        joints_2d=gt_joints[..., :2],
        joints_2d_visible=jnp.ones((2, 24)),
        real_pose=gt_pose, real_shape=gt_shape)

    step = jax.jit(make_adversarial_train_step(mesh, disc, gen_tx, disc_tx))
    metrics0 = None
    for i in range(5):
        gen_vars, disc_vars, gen_opt, disc_opt, metrics = step(
            gen_vars, disc_vars, gen_opt, disc_opt, batch)
        if metrics0 is None:
            metrics0 = {k: float(v) for k, v in metrics.items()}
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # smoke bound only: 5 adam steps from random init with the faithful
    # activation-free HMR fc stack (hmr_head.py:76-80) wander more than
    # the old relu head did before settling
    assert float(metrics['gen_loss']) <= metrics0['gen_loss'] * 2.5


def test_imshow_mesh_3d_renders():
    """The z-buffer rasterizer paints the projected mesh region and
    respects occlusion ordering."""
    import numpy as np
    from vitpose_tpu.api.inference import imshow_mesh_3d
    img = np.zeros((64, 64, 3), np.uint8)
    # two triangles at different depths covering the image center
    near = np.array([[-0.2, -0.2, 2.0], [0.2, -0.2, 2.0], [0.0, 0.3, 2.0]],
                    np.float32)
    far = near.copy()
    far[:, 2] = 4.0
    faces = np.array([[0, 1, 2]])
    out = imshow_mesh_3d(img, [far, near], [faces, faces], (32, 32),
                         (64, 64), colors=[(255, 0, 0), (0, 255, 0)])
    center = out[32, 32]
    assert center[1] > 100 and center[0] < 50, center   # near (green) wins
    assert (out != 0).any()


def test_flip_rotate_smpl_golden():
    """flip/rotate SMPL pose + 3D joints vs the reference mesh_transform."""
    import importlib.util, sys, types
    import numpy as np
    spec = importlib.util.find_spec('cv2')
    # load reference mesh_transform with stubs
    from ref_loader import ref_post_transforms, _load
    pt = ref_post_transforms()
    fake_pp = types.ModuleType('mmpose.core.post_processing')
    for n in ('affine_transform', 'fliplr_joints', 'get_affine_transform'):
        setattr(fake_pp, n, getattr(pt, n))
    class _Reg:
        def register_module(self, *a, **k):
            return lambda cls: cls
    fb = types.ModuleType('mmpose.datasets.builder'); fb.PIPELINES = _Reg()
    mt = _load('/root/reference/mmpose/datasets/pipelines/mesh_transform.py',
               '_ref_mesh_transform',
               pre_modules=[('mmcv', types.ModuleType('mmcv')),
                            ('mmpose', types.ModuleType('mmpose')),
                            ('mmpose.core', types.ModuleType('mmpose.core')),
                            ('mmpose.core.post_processing', fake_pp),
                            ('mmpose.datasets',
                             types.ModuleType('mmpose.datasets')),
                            ('mmpose.datasets.builder', fb)])
    from vitpose_tpu.data.mesh import (flip_smpl_pose, rotate_smpl_pose,
                                       flip_joints_3d, rotate_joints_3d)
    rng = np.random.RandomState(0)
    pose = rng.randn(72).astype(np.float32)
    np.testing.assert_allclose(flip_smpl_pose(pose),
                               mt._flip_smpl_pose(pose.copy()), rtol=1e-6)
    np.testing.assert_allclose(rotate_smpl_pose(pose, 33.0),
                               mt._rotate_smpl_pose(pose.copy(), 33.0),
                               rtol=1e-4, atol=1e-5)
    j = rng.randn(24, 3).astype(np.float32)
    v = (rng.rand(24, 1) > 0.3).astype(np.float32)
    ours_j, ours_v = flip_joints_3d(j, v)
    ref_j, ref_v = mt._flip_joints_3d(
        j.copy(), v.copy(),
        [[0, 5], [1, 4], [2, 3], [6, 11], [7, 10], [8, 9], [20, 21],
         [22, 23]])
    np.testing.assert_allclose(ours_j, ref_j, rtol=1e-6)
    np.testing.assert_allclose(ours_v, ref_v)
    np.testing.assert_allclose(rotate_joints_3d(j, 17.0),
                               mt._rotate_joints_3d(j.copy(), 17.0),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_mesh_adv_training_through_datasets():
    """Fixture-driven adversarial epoch: Mixed(H36M) + Mosh through the
    loader into the single-jit adversarial step; losses finite and
    generator loss decreases while overfitting."""
    import optax
    from vitpose_tpu.data.mesh import (MeshDataset, MoshDataset,
                                       MeshMixDataset, MeshAdvLoader)
    ds = MeshDataset('/root/reference/tests/data/h36m/test_h36m.npz',
                     '/root/reference/tests/data/h36m',
                     image_size=(64, 64))
    mix = MeshMixDataset([ds, ds], partition=[0.6, 0.4])
    mosh = MoshDataset('/root/reference/tests/data/mosh/test_mosh.npz')
    loader = MeshAdvLoader(mix, mosh, batch_size=2, image_size=(64, 64),
                           seed=0)
    batch = next(iter(loader))
    assert batch['imgs'].shape == (2, 64, 64, 3)
    assert batch['joints_2d'].shape == (2, 24, 2)
    assert batch['real_pose'].shape == (2, 72)

    rng = jax.random.PRNGKey(0)
    mesh = ParametricMesh(ResNet(depth=18), mock_smpl, num_iters=2)
    disc = SMPLDiscriminator(hidden=32)
    imgs = jnp.asarray(batch['imgs'], jnp.float32)
    gen_vars = mesh.init(rng, imgs)
    disc_vars = disc.init(rng, jnp.zeros((2, 72)), jnp.zeros((2, 10)))
    gen_tx, disc_tx = optax.adam(1e-3), optax.adam(1e-4)
    gen_opt = gen_tx.init(gen_vars)
    disc_opt = disc_tx.init(disc_vars)
    step = jax.jit(make_adversarial_train_step(mesh, disc, gen_tx, disc_tx))

    first = last = None
    for ep in range(4):
        loader.set_epoch(ep)
        for batch in loader:
            jb = {k: jnp.asarray(v) for k, v in batch.items()
                  if k not in ('pose', 'beta', 'has_smpl')}
            gen_vars, disc_vars, gen_opt, disc_opt, metrics = step(
                gen_vars, disc_vars, gen_opt, disc_opt, jb)
            val = float(metrics['loss_2d'])
            assert np.isfinite(val)
            first = val if first is None else first
            last = val
    assert last < first, (first, last)


def test_train_mesh_model_from_config():
    """tools/train.py path for the mesh family: config-driven adversarial
    steps on the fixture datasets."""
    from vitpose_tpu.train.loop import train_model

    cfg = dict(
        model=dict(family='mesh', backbone_type='resnet',
                   backbone_overrides=dict(depth=18), num_iters=2,
                   smpl='linear', disc_hidden=32),
        data=dict(
            image_size=(64, 64), batch_size=2,
            train=dict(
                configs=[dict(
                    ann_file='/root/reference/tests/data/h36m/'
                             'test_h36m.npz',
                    img_prefix='/root/reference/tests/data/h36m')],
                partition=[1.0],
                adv_ann_file='/root/reference/tests/data/mosh/'
                             'test_mosh.npz')),
        optimizer=dict(base_lr=1e-3, disc_lr=1e-4, total_epochs=1),
    )
    variables, metrics = train_model(cfg, max_steps=2)
    assert 'gen' in variables and 'disc' in variables
    assert all(np.isfinite(v) for v in metrics.values()), metrics


def test_mesh_dataset_evaluate_protocol():
    """MeshDataset.evaluate matches the reference joint_error protocol:
    predicting the GT joints exactly gives MPJPE == 0; a 10mm x-shift on
    every pred joint gives MPJPE == 10mm and MPJPE-PA == 0 only after the
    pelvis centring cancels the translation (it does, since the shift is
    global)."""
    from vitpose_tpu.data.mesh import MeshDataset
    ds = MeshDataset('/root/reference/tests/data/h36m/test_h36m.npz',
                     '/root/reference/tests/data/h36m')
    gt = np.stack([r['joints_3d'] for r in ds.db])
    results = [dict(keypoints_3d=gt,
                    image_path=[r['image_file'] for r in ds.db])]
    stats = ds.evaluate(results)
    assert stats["MPJPE"] < 1e-3 and stats["MPJPE-PA"] < 1e-3
    shifted = gt + np.array([0.01, 0.0, 0.0])
    stats = ds.evaluate([dict(keypoints_3d=shifted,
                              image_path=[r['image_file']
                                          for r in ds.db])])
    # global translation is removed by pelvis centring in BOTH metrics
    assert stats['MPJPE'] < 1e-3


def test_mesh_eval_cli(tmp_path):
    """tools/test.py family dispatch for mesh: train 2 adversarial steps
    -> final.npz -> CLI eval runs the joint_error protocol (finite
    MPJPE / MPJPE-PA in mm)."""
    import importlib.util
    import json
    import os
    import sys
    from vitpose_tpu.train.loop import train_model

    wd = str(tmp_path)
    cfgd = dict(
        model=dict(family='mesh', backbone_type='resnet',
                   backbone_overrides=dict(depth=18), num_iters=2,
                   smpl='linear', disc_hidden=32),
        data=dict(
            image_size=(64, 64), batch_size=2,
            train=dict(
                configs=[dict(
                    ann_file='/root/reference/tests/data/h36m/'
                             'test_h36m.npz',
                    img_prefix='/root/reference/tests/data/h36m')],
                partition=[1.0],
                adv_ann_file='/root/reference/tests/data/mosh/'
                             'test_mosh.npz'),
            val=dict(ann_file='/root/reference/tests/data/h36m/'
                              'test_h36m.npz',
                     img_prefix='/root/reference/tests/data/h36m')),
        optimizer=dict(base_lr=1e-3, disc_lr=1e-4, total_epochs=1),
        runtime=dict(work_dir=wd))
    train_model(cfgd, max_steps=2)
    cfg_path = os.path.join(wd, 'cfg.py')
    with open(cfg_path, 'w') as f:
        for k, v in cfgd.items():
            f.write(f"{k} = {v!r}\n")
    spec = importlib.util.spec_from_file_location(
        '_test_cli_mesh', '/root/repo/tools/test.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = ['tools/test.py', cfg_path, os.path.join(wd, 'final.npz'),
                '--out', os.path.join(wd, 'stats.json')]
    try:
        mod.main()
    finally:
        sys.argv = old
    stats = json.load(open(os.path.join(wd, 'stats.json')))
    assert set(stats) == {'MPJPE', 'MPJPE-PA'}
    assert all(np.isfinite(v) for v in stats.values())


def test_mesh_in_loop_validation(tmp_path):
    """`evaluation = dict(interval=1)` runs the joint_error protocol at
    epoch end of the adversarial loop and logs a mode='val' line."""
    import json
    import os
    from vitpose_tpu.train.loop import train_model

    wd = str(tmp_path)
    cfg = dict(
        model=dict(family='mesh', backbone_type='resnet',
                   backbone_overrides=dict(depth=18), num_iters=2,
                   smpl='linear', disc_hidden=32),
        data=dict(
            image_size=(64, 64), batch_size=2,
            train=dict(
                configs=[dict(
                    ann_file='/root/reference/tests/data/h36m/'
                             'test_h36m.npz',
                    img_prefix='/root/reference/tests/data/h36m')],
                partition=[1.0],
                adv_ann_file='/root/reference/tests/data/mosh/'
                             'test_mosh.npz'),
            val=dict(ann_file='/root/reference/tests/data/h36m/'
                              'test_h36m.npz',
                     img_prefix='/root/reference/tests/data/h36m')),
        optimizer=dict(base_lr=1e-3, disc_lr=1e-4, total_epochs=1),
        evaluation=dict(interval=1),
        runtime=dict(work_dir=wd))
    train_model(cfg)
    lines = [json.loads(l) for l in
             open(os.path.join(wd, 'train.log.json'))]
    val = [l for l in lines if l.get('mode') == 'val']
    assert len(val) == 1
    assert np.isfinite(val[0]['MPJPE']) and np.isfinite(val[0]['MPJPE-PA'])


def test_rot6d_to_axis_angle_quaternion_stability():
    """rot6d -> axis-angle must roundtrip through cv2.Rodrigues across the
    whole rotation group, INCLUDING the 180-degree neighborhood where a
    skew-part axis extraction degenerates (ADVICE r4: quaternion route).
    Reference conversion being matched: mmpose/models/utils/geometry.py
    rot6d_to_rotmat + the axis-angle pose smpl_fn consumes."""
    import cv2
    from vitpose_tpu.models.mesh import rot6d_to_axis_angle
    rs = np.random.RandomState(0)
    for ang in (np.pi - 1e-4, np.pi - 1e-2, 2.5, 0.5, 1e-5):
        aa = rs.randn(8, 3)
        aa = aa / np.linalg.norm(aa, axis=1, keepdims=True) * ang
        rots = np.stack([cv2.Rodrigues(a)[0] for a in aa])
        # 6d = first two columns of R, row-major [3,2] (Zhou et al.)
        r6 = np.tile(rots[:, :, :2].reshape(8, 6), (1, 24))
        back = np.asarray(
            rot6d_to_axis_angle(jnp.asarray(r6, jnp.float32)))
        back = back.reshape(8, 24, 3)[:, 0]
        rots2 = np.stack([cv2.Rodrigues(b.astype(np.float64))[0]
                          for b in back])
        assert np.abs(rots2 - rots).max() < 5e-3, ang


def test_hmr_mean_params_frozen():
    """The reference registers init_pose/init_shape/init_cam as
    NON-TRAINABLE buffers (hmr_head.py:54-56); our mean_params must get a
    zero gradient so plain adam never moves it (ADVICE r4)."""
    head = HMRMeshHead()
    feat = jnp.ones((2, 32))
    hv = head.init(jax.random.PRNGKey(0), feat)

    def loss(p):
        pose, shape, cam = head.apply(p, feat)
        return jnp.sum(pose ** 2) + jnp.sum(shape ** 2) + jnp.sum(cam ** 2)

    g = jax.grad(loss)(hv)
    assert (np.asarray(g['params']['mean_params']) == 0).all()
    # ...and the forward still actually USES the mean as the start point
    hv2 = jax.tree_util.tree_map(lambda x: x, hv)
    mp = np.asarray(hv2['params']['mean_params']).copy()
    mp[:5] += 1.0
    hv2['params']['mean_params'] = jnp.asarray(mp)
    out1 = head.apply(hv, feat)[0]
    out2 = head.apply(hv2, feat)[0]
    assert not np.allclose(np.asarray(out1), np.asarray(out2))

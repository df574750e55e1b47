"""3D target generators (golden vs reference pose3d_transform.py) and the
InterHand3D / VoxelPose training-loss paths they feed."""
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_loader import _load


def _load_ref_pose3d_transform():
    mmcv = types.ModuleType('mmcv')
    mmcv_utils = types.ModuleType('mmcv.utils')
    mmcv_utils.build_from_cfg = lambda *a, **k: None
    mmcv.utils = mmcv_utils

    class _Reg:
        def register_module(self, *a, **k):
            return lambda cls: cls

    cam_pkg = types.ModuleType('mmpose.core.camera')
    cam_pkg.CAMERAS = _Reg()
    pp = types.ModuleType('mmpose.core.post_processing')
    pp.fliplr_regression = lambda *a, **k: None
    fb = types.ModuleType('mmpose.datasets.builder')
    fb.PIPELINES = _Reg()
    return _load(
        '/root/reference/mmpose/datasets/pipelines/pose3d_transform.py',
        'mmpose.datasets.pipelines.pose3d_transform',
        pre_modules=[('mmcv', mmcv), ('mmcv.utils', mmcv_utils),
                     ('mmpose', types.ModuleType('mmpose')),
                     ('mmpose.core', types.ModuleType('mmpose.core')),
                     ('mmpose.core.camera', cam_pkg),
                     ('mmpose.core.post_processing', pp),
                     ('mmpose.datasets', types.ModuleType('mmpose.datasets')),
                     ('mmpose.datasets.builder', fb)])


def test_generate_3d_heatmaps_golden():
    from vitpose_tpu.ops.target import generate_3d_heatmaps
    mt = _load_ref_pose3d_transform()
    rng = np.random.RandomState(0)
    K, W, H, D = 8, 16, 16, 12
    for sigma, max_bound, use_jw in ((2, 1.0, False), (1.5, 255.0, True)):
        joints = np.zeros((K, 3), np.float32)
        joints[:, 0] = rng.uniform(-10, 70, K)     # image-pixel x
        joints[:, 1] = rng.uniform(-10, 70, K)
        joints[:, 2] = rng.uniform(-250, 250, K)   # metric z
        vis = (rng.uniform(size=(K, 3)) > 0.2).astype(np.float32)
        jw = rng.uniform(0.5, 1.5, K).astype(np.float32)
        results = dict(
            joints_3d=joints, joints_3d_visible=vis,
            ann_info=dict(image_size=np.array([64, 64]),
                          heatmap_size=np.array([W, H, D]),
                          heatmap3d_depth_bound=400.0,
                          joint_weights=jw,
                          use_different_joint_weights=use_jw))
        ref = mt.Generate3DHeatmapTarget(sigma=sigma, max_bound=max_bound)(
            dict(results))
        tgt, wgt = generate_3d_heatmaps(
            joints, vis, (64, 64), (W, H, D), 400.0, sigma=sigma,
            max_bound=max_bound,
            joint_weights=jw if use_jw else None)
        np.testing.assert_allclose(tgt, ref['target'],
                                   atol=1e-6 * max_bound + 1e-6)
        np.testing.assert_allclose(wgt, ref['target_weight'], atol=1e-6)


def test_generate_3d_heatmaps_joint_indices():
    from vitpose_tpu.ops.target import generate_3d_heatmaps
    mt = _load_ref_pose3d_transform()
    rng = np.random.RandomState(3)
    joints = rng.uniform(0, 60, (10, 3)).astype(np.float32)
    joints[:, 2] = rng.uniform(-150, 150, 10)
    vis = np.ones((10, 3), np.float32)
    sel = [1, 4, 7]
    results = dict(
        joints_3d=joints, joints_3d_visible=vis,
        ann_info=dict(image_size=np.array([64, 48]),
                      heatmap_size=np.array([16, 12, 8]),
                      heatmap3d_depth_bound=300.0,
                      joint_weights=np.ones(10, np.float32),
                      use_different_joint_weights=False))
    ref = mt.Generate3DHeatmapTarget(sigma=2, joint_indices=sel)(
        dict(results))
    tgt, wgt = generate_3d_heatmaps(joints, vis, (64, 48), (16, 12, 8),
                                    300.0, sigma=2, joint_indices=sel)
    np.testing.assert_allclose(tgt, ref['target'], atol=1e-5)
    np.testing.assert_allclose(wgt, ref['target_weight'], atol=1e-6)


def test_generate_voxel_3d_targets_golden():
    from vitpose_tpu.ops.target import generate_voxel_3d_targets
    mt = _load_ref_pose3d_transform()
    rng = np.random.RandomState(1)
    for n_people, idxs in ((3, None), (2, [11])):
        joints = rng.uniform(-3000, 3000, (n_people, 15, 3)).astype(
            np.float32)
        joints[..., 2] = rng.uniform(0, 2000, (n_people, 15))
        vis = (rng.uniform(size=(n_people, 15, 1)) > 0.3).astype(np.float32)
        results = dict(
            joints_3d=list(joints), joints_3d_visible=list(vis),
            ann_info=dict(space_size=[8000, 8000, 2000],
                          space_center=[0, 0, 1000],
                          cube_size=[20, 20, 8]))
        ref = mt.GenerateVoxel3DHeatmapTarget(sigma=200.0,
                                              joint_indices=idxs)(
            dict(results))
        got = generate_voxel_3d_targets(joints, vis,
                                        [8000, 8000, 2000], [0, 0, 1000],
                                        [20, 20, 8], sigma=200.0,
                                        joint_indices=idxs)
        np.testing.assert_allclose(got, ref['targets_3d'], atol=1e-5)


def test_interhand3d_losses_perfect_vs_noisy():
    from vitpose_tpu.models.interhand3d import interhand3d_losses
    from vitpose_tpu.ops.target import generate_3d_heatmaps
    rng = np.random.RandomState(2)
    N, K, D, H, W, B = 2, 6, 8, 8, 8, 16
    tgt = np.stack([generate_3d_heatmaps(
        rng.uniform(0, 60, (K, 3)), np.ones(K), (64, 64), (W, H, D),
        400.0)[0] for _ in range(N)])
    wgt = np.ones((N, K))
    rel_root = np.array([50.0, -120.0])
    root_w = np.ones(N)
    hand_type = np.array([[1.0, 0.0], [1.0, 1.0]])
    type_w = np.ones(N)

    # "perfect" root/type predictions, exact heatmaps
    root_logits = np.full((N, B), -30.0)
    for i, r in enumerate(rel_root):
        root_logits[i, int(round((r / 400.0 + 0.5) * B))] = 30.0
    type_logits = np.where(hand_type > 0.5, 20.0, -20.0)
    good = interhand3d_losses(
        (jnp.asarray(tgt), jnp.asarray(root_logits),
         jnp.asarray(type_logits)),
        tgt, wgt, rel_root, root_w, hand_type, type_w,
        root_depth_bins=B, root_depth_range_mm=400.0)
    assert float(good['hand_loss']) < 1e-8
    assert float(good['rel_root_loss']) < 0.6       # one-bin quantization
    assert float(good['hand_type_loss']) < 1e-6

    bad = interhand3d_losses(
        (jnp.asarray(tgt + rng.normal(0, 0.3, tgt.shape).astype(np.float32)),
         jnp.asarray(rng.normal(0, 1, (N, B)).astype(np.float32)),
         jnp.asarray(-type_logits)),
        tgt, wgt, rel_root, root_w, hand_type, type_w,
        root_depth_bins=B, root_depth_range_mm=400.0)
    assert float(bad['hand_loss']) > float(good['hand_loss'])
    assert float(bad['rel_root_loss']) > float(good['rel_root_loss'])
    assert float(bad['hand_type_loss']) > float(good['hand_type_loss'])


def test_voxelpose_training_losses_decrease():
    from vitpose_tpu.models.voxelpose import DetectAndRegress
    from vitpose_tpu.ops.target import generate_voxel_3d_targets
    from test_voxelpose import two_cameras

    cams = two_cameras()
    K = 5
    gt_joints = np.array([[[200.0 + 40 * k, 300.0, 1100.0 - 30 * k]
                           for k in range(K)]], np.float32)   # [1, K, 3]
    gt_vis = np.ones((1, K), np.float32)
    roots = gt_joints[:, :1, :]                               # person root
    h = w = 32
    heatmaps = []
    for cam in cams:
        maps = []
        for k in range(K):
            pix = np.asarray(cam.camera_to_pixel(
                cam.world_to_camera(gt_joints[0, k][None])))[0]
            ys, xs = np.mgrid[0:h, 0:w]
            maps.append(np.exp(-((xs - pix[0]) ** 2
                                 + (ys - pix[1]) ** 2) / 8.0))
        heatmaps.append(np.stack(maps))
    heatmaps = jnp.asarray(np.stack(heatmaps), jnp.float32)

    model = DetectAndRegress(num_joints=K, space_center=(0, 0, 1000),
                             space_size=(2000, 2000, 2000),
                             space_resolution=(12, 12, 12),
                             cube_size=(600, 600, 600),
                             cube_resolution=(8, 8, 8), mid_channels=4)
    variables = model.init(jax.random.PRNGKey(0))
    targets_3d = generate_voxel_3d_targets(
        roots[:, 0:1], np.ones((1, 1, 1)), (2000, 2000, 2000),
        (0, 0, 1000), (12, 12, 12), sigma=200.0, joint_indices=[0])
    candidates = jnp.asarray(roots[:, 0])                     # [1, 3]
    cand_mask = jnp.ones((1,))

    def loss_fn(params_tree):
        losses, _ = model.training_losses(
            params_tree, heatmaps, cams, candidates, cand_mask,
            gt_joints, gt_vis, targets_3d, train=False)
        return losses['loss_center'] + losses['loss_pose'], losses

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (l0, parts0), grads = grad_fn(variables)
    assert np.isfinite(float(l0))
    assert float(parts0['loss_pose']) > 0
    lr = 1e-5
    vars_new = jax.tree_util.tree_map(lambda v, g: v - lr * g,
                                      variables, grads)
    (l1, _), _ = grad_fn(vars_new)
    assert float(l1) < float(l0), (float(l0), float(l1))

    # the BN-mutating path runs and returns updated stats
    losses, new_vars = model.training_losses(
        variables, heatmaps, cams, candidates, cand_mask, gt_joints,
        gt_vis, targets_3d, train=True)
    assert set(losses) == {'loss_center', 'loss_pose'}
    assert 'batch_stats' in new_vars['center']


def test_train_voxelpose_model_smoke():
    """tools/train.py path for the voxelpose family: a couple of steps on
    the reference panoptic fixture run and produce finite losses."""
    import glob
    from vitpose_tpu.train.loop import train_model

    seqs = sorted(glob.glob(
        '/root/reference/tests/data/panoptic_body3d/*'))
    if not seqs:
        pytest.skip('panoptic fixture missing')
    cfg = dict(
        model=dict(family='voxelpose', num_joints=19,
                   space_center=(0, 0, 1000),
                   space_size=(4000, 4000, 2000),
                   space_resolution=(12, 12, 8),
                   cube_size=(800, 800, 800),
                   cube_resolution=(8, 8, 8), mid_channels=4),
        data=dict(dataset='panoptic_body3d', heatmap_size=(48, 64),
                  train=dict(seq_dirs=seqs,
                             cam_names=('00_03', '00_06'))),
        target=dict(sigma=200.0),
        optimizer=dict(base_lr=1e-4, total_epochs=1),
    )
    variables, metrics = train_model(cfg, max_steps=2)
    assert set(metrics) >= {'loss_center', 'loss_pose', 'total_loss'}
    assert all(np.isfinite(v) for v in metrics.values())
    assert 'center' in variables and 'params' in variables['center']


def test_voxelpose_eval_cli(tmp_path):
    """tools/test.py family dispatch for voxelpose: train 2 steps ->
    final.npz -> CLI eval prints the reference protocol stats."""
    import glob
    import importlib.util
    import json
    import os
    import sys
    from vitpose_tpu.train.loop import train_model

    seqs = sorted(glob.glob(
        '/root/reference/tests/data/panoptic_body3d/*'))
    if not seqs:
        pytest.skip('panoptic fixture missing')
    wd = str(tmp_path)
    cfgd = dict(
        model=dict(family='voxelpose', num_joints=19,
                   space_center=(0, 0, 1000),
                   space_size=(4000, 4000, 2000),
                   space_resolution=(12, 12, 8),
                   cube_size=(800, 800, 800),
                   cube_resolution=(8, 8, 8), mid_channels=4,
                   center_threshold=-1e9, max_people=4),
        data=dict(dataset='panoptic_body3d', heatmap_size=(48, 64),
                  train=dict(seq_dirs=seqs, cam_names=('00_03', '00_06')),
                  val=dict(seq_dirs=seqs[:1],
                           cam_names=('00_03', '00_06'))),
        target=dict(sigma=200.0),
        optimizer=dict(base_lr=1e-4, total_epochs=1),
        runtime=dict(work_dir=wd))
    train_model(cfgd, max_steps=2)
    cfg_path = os.path.join(wd, 'cfg.py')
    with open(cfg_path, 'w') as f:
        for k, v in cfgd.items():
            f.write(f"{k} = {v!r}\n")
    spec = importlib.util.spec_from_file_location(
        '_test_cli_vp', '/root/repo/tools/test.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = ['tools/test.py', cfg_path, os.path.join(wd, 'final.npz'),
                '--out', os.path.join(wd, 'stats.json'),
                '--metric', 'mpjpe', 'mAP']
    try:
        mod.main()
    finally:
        sys.argv = old
    stats = json.load(open(os.path.join(wd, 'stats.json')))
    assert 'RECALL 500mm' in stats and 'mAP' in stats

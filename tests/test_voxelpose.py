"""VoxelPose multiview components: projection aggregation, V2V, heads."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitpose_tpu.models.voxelpose import (make_voxel_grid,
                                          project_heatmaps_to_voxels,
                                          V2VNet, CuboidCenterHead,
                                          CuboidPoseHead)
from vitpose_tpu.ops.camera import SimpleCamera


def two_cameras():
    """Two orthogonal cameras looking at the origin from y=-3000, x=-3000."""
    cams = []
    for pos in ([0, -3000, 1000], [-3000, 0, 1000]):
        # rotation: x right, y down, z forward (looking at the origin)
        fwd = -np.asarray(pos, np.float64)
        fwd[2] = 0
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross([0, 0, -1], fwd)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        r_w2c = np.stack([right, down, fwd])      # rows: camera axes
        cams.append(SimpleCamera(dict(
            R=r_w2c.T,                             # camera-to-world
            T=np.asarray(pos, np.float64).reshape(3, 1),
            f=[[80.0], [80.0]], c=[[32.0], [32.0]])))
    return cams


def test_projection_aggregation_peaks_at_true_point():
    cams = two_cameras()
    target = np.array([200.0, 300.0, 1100.0])
    k, h, w = 1, 64, 64
    heatmaps = []
    for cam in cams:
        pix = np.asarray(cam.camera_to_pixel(
            cam.world_to_camera(target[None])))[0]
        ys, xs = np.mgrid[0:h, 0:w]
        hm = np.exp(-((xs - pix[0]) ** 2 + (ys - pix[1]) ** 2) / 8.0)
        heatmaps.append(hm[None])
    heatmaps = jnp.asarray(np.stack(heatmaps))

    grid = make_voxel_grid([0, 0, 1000], [2000, 2000, 2000], (24, 24, 24))
    vol = project_heatmaps_to_voxels(heatmaps, cams, grid)
    vol = np.asarray(vol)[..., 0]
    best = np.unravel_index(vol.argmax(), vol.shape)
    found = np.asarray(grid)[best]
    assert np.linalg.norm(found - target) < 200.0, (found, target)


def test_v2vnet_and_heads():
    x = jnp.ones((1, 16, 16, 16, 4))
    v2v = V2VNet(mid_channels=8, out_channels=5)
    v = v2v.init(jax.random.PRNGKey(0), x, train=False)
    assert v2v.apply(v, x, train=False).shape == (1, 16, 16, 16, 5)

    center = CuboidCenterHead(mid_channels=8)
    cv = center.init(jax.random.PRNGKey(1), x, train=False)
    vol = center.apply(cv, x, train=False)
    assert vol.shape == (1, 16, 16, 16)
    grid = make_voxel_grid([0, 0, 0], [1000, 1000, 1000], (16, 16, 16))
    props = CuboidCenterHead.get_proposals(np.asarray(vol)[0], grid,
                                           max_people=3, threshold=-1e9)
    assert len(props) >= 1 and props[0][0].shape == (3,)

    pose = CuboidPoseHead(num_joints=5, mid_channels=8)
    pv = pose.init(jax.random.PRNGKey(2), x, grid, train=False)
    joints = pose.apply(pv, x, grid, train=False)
    assert joints.shape == (1, 5, 3)
    # soft-argmax output stays inside the grid bounds
    assert np.abs(np.asarray(joints)).max() <= 500.0 + 1e-3


def test_detect_and_regress_pipeline():
    from vitpose_tpu.models.voxelpose import DetectAndRegress
    cams = two_cameras()
    target = np.array([200.0, 300.0, 1100.0])
    h = w = 64
    heatmaps = []
    for cam in cams:
        pix = np.asarray(cam.camera_to_pixel(
            cam.world_to_camera(target[None])))[0]
        ys, xs = np.mgrid[0:h, 0:w]
        hm = np.exp(-((xs - pix[0]) ** 2 + (ys - pix[1]) ** 2) / 8.0)
        heatmaps.append(np.tile(hm[None], (5, 1, 1)))
    heatmaps = jnp.asarray(np.stack(heatmaps))

    model = DetectAndRegress(num_joints=5, space_center=(0, 0, 1000),
                             space_size=(2000, 2000, 2000),
                             space_resolution=(16, 16, 16),
                             cube_size=(600, 600, 600),
                             cube_resolution=(8, 8, 8),
                             mid_channels=4, max_people=2,
                             center_threshold=-1e9)
    v = model.init(jax.random.PRNGKey(0))
    people = model.forward(v, heatmaps, cams)
    assert len(people) >= 1
    joints, score = people[0]
    assert joints.shape == (5, 3)
    assert np.isfinite(joints).all()


def test_project_heatmaps_arr_matches_object_path():
    """stack_camera_params + project_heatmaps_to_voxels_arr (the batched
    in-jit projection) equals the SimpleCamera-object path, including
    rational-6 distortion on one view and no distortion on the other."""
    from vitpose_tpu.models.voxelpose import (stack_camera_params,
                                              project_heatmaps_to_voxels_arr)
    cams = two_cameras()
    # give view 0 panoptic-style distortion
    import copy
    d = dict(R=np.asarray(cams[0].R_c2w), T=None)
    p0 = dict(R=np.asarray(cams[0].R_w2c).T,
              T=np.asarray(cams[0].T_c2w).reshape(3, 1),
              f=[[80.0], [80.0]], c=[[32.0], [32.0]],
              k=[-0.2, 0.1, 0.01], p=[1e-3, -5e-4])
    cams[0] = SimpleCamera(p0)
    rng = np.random.RandomState(0)
    heatmaps = jnp.asarray(rng.rand(2, 3, 64, 64).astype(np.float32))
    grid = make_voxel_grid([0, 0, 1000], [2000, 2000, 2000], (10, 12, 8))
    ref = np.asarray(project_heatmaps_to_voxels(heatmaps, cams, grid))
    cp = stack_camera_params(cams)
    got = np.asarray(jax.jit(project_heatmaps_to_voxels_arr)(
        heatmaps, cp, grid))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_training_losses_batched_matches_single_frame():
    """training_losses_batched with G=1, P=1 equals training_losses (same
    losses and updated BN stats); with G=2 it accepts a stacked frame
    batch and returns finite losses."""
    from vitpose_tpu.models.voxelpose import (DetectAndRegress,
                                              stack_camera_params)
    cams = two_cameras()
    K = 3
    rng = np.random.RandomState(1)
    heatmaps = rng.rand(2, K, 64, 64).astype(np.float32)
    model = DetectAndRegress(num_joints=K, space_center=(0, 0, 1000),
                             space_size=(2000, 2000, 2000),
                             space_resolution=(12, 12, 12),
                             cube_size=(600, 600, 600),
                             cube_resolution=(8, 8, 8), mid_channels=4)
    variables = model.init(jax.random.PRNGKey(0))
    from vitpose_tpu.ops.target import generate_voxel_3d_targets
    roots = np.array([[100.0, -50.0, 1050.0]])
    targets_3d = generate_voxel_3d_targets(
        roots[:, None], np.ones((1, 1, 1)), (2000, 2000, 2000),
        (0, 0, 1000), (12, 12, 12), sigma=200.0, joint_indices=[0])
    gt_joints = rng.randn(1, K, 3).astype(np.float32) * 100 + roots[:, None]
    gt_vis = np.ones((1, K), np.float32)

    ref_losses, ref_vars = model.training_losses(
        variables, jnp.asarray(heatmaps), cams, jnp.asarray(roots),
        jnp.ones((1,)), gt_joints, gt_vis, targets_3d, train=True)

    cp = jax.tree.map(lambda x: np.asarray(x)[None],
                      stack_camera_params(cams))
    got_losses, got_vars = model.training_losses_batched(
        variables, jnp.asarray(heatmaps)[None], cp,
        jnp.asarray(roots)[None], jnp.ones((1, 1)), gt_joints[None],
        gt_vis[None], np.asarray(targets_3d)[None], train=True)
    for k in ('loss_center', 'loss_pose'):
        np.testing.assert_allclose(float(got_losses[k]),
                                   float(ref_losses[k]), rtol=1e-5,
                                   err_msg=k)
    for head in ('center', 'pose'):
        ra = jax.tree_util.tree_flatten_with_path(
            jax.tree.map(np.asarray, ref_vars[head]['batch_stats']))[0]
        ga = dict(jax.tree_util.tree_flatten_with_path(
            jax.tree.map(np.asarray, got_vars[head]['batch_stats']))[0])
        for path, val in ra:
            np.testing.assert_allclose(ga[path], val, rtol=1e-5,
                                       atol=1e-7, err_msg=f'{head}{path}')

    # G=2 with a padded second candidate slot
    got2, _ = model.training_losses_batched(
        variables, jnp.asarray(np.stack([heatmaps, heatmaps])),
        jax.tree.map(lambda x: np.concatenate([x, x]), cp),
        jnp.asarray(np.concatenate(
            [roots[None], roots[None]])), jnp.ones((2, 1)),
        np.stack([gt_joints, gt_joints]), np.stack([gt_vis, gt_vis]),
        np.stack([np.asarray(targets_3d)] * 2), train=True)
    assert all(np.isfinite(float(v)) for v in got2.values())


def test_voxelpose_loop_trains_on_mesh(tmp_path):
    """train_model('voxelpose') accepts runtime.n_data + a frame batch
    size and runs the sharded frame-batched step."""
    import glob
    from vitpose_tpu.train.loop import train_model
    seqs = sorted(glob.glob('/root/reference/tests/data/panoptic_body3d/*'))
    if not seqs:
        pytest.skip('panoptic fixture missing')
    cfg = dict(
        model=dict(family='voxelpose', num_joints=19,
                   space_center=(0, 0, 1000),
                   space_size=(4000, 4000, 2000),
                   space_resolution=(12, 12, 8),
                   cube_size=(800, 800, 800),
                   cube_resolution=(8, 8, 8), mid_channels=4,
                   max_people_train=4),
        data=dict(dataset='panoptic_body3d', heatmap_size=(48, 64),
                  batch_size=2,
                  train=dict(seq_dirs=seqs, cam_names=('00_03', '00_06'))),
        target=dict(sigma=200.0),
        optimizer=dict(base_lr=1e-4, total_epochs=1),
        runtime=dict(n_data=2, work_dir=str(tmp_path)),
    )
    variables, metrics = train_model(cfg, max_steps=2)
    assert all(np.isfinite(v) for v in metrics.values())

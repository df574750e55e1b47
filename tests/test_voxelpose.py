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

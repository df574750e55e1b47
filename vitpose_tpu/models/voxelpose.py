"""VoxelPose-style multiview 3D pose: voxel aggregation + V2VNet + heads.

Counterparts of the reference multiview stack
(mmpose/models/detectors/multiview_pose.py `DetectAndRegress`,
 mmpose/models/backbones/v2v_net.py `V2VNet`,
 mmpose/models/heads/voxelpose_head.py `CuboidCenterHead`/`CuboidPoseHead`):

  * `project_heatmaps_to_voxels` — the core multiview step: sample every
    camera view's 2D heatmaps at the pixel projections of a 3D voxel grid
    and average, producing [X, Y, Z, K] feature volumes. Pure jnp gathers —
    vmappable over proposals, jit-able end to end.
  * `V2VNet` — 3D conv encoder-decoder with skip connections (NDHWC).
  * `CuboidCenterHead` — 1-channel 3D heatmap over the space volume; local-
    maximum candidates become person proposals.
  * `CuboidPoseHead` — per-joint 3D heatmaps decoded with soft-argmax over
    the voxel grid (beta-scaled softmax, like the reference).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def make_voxel_grid(center, size, resolution):
    """Axis-aligned voxel grid. center [3], size [3] (mm),
    resolution (nx, ny, nz) -> [nx, ny, nz, 3] world coords."""
    center = jnp.asarray(center, jnp.float32)
    size = jnp.asarray(size, jnp.float32)
    axes = [jnp.linspace(center[i] - size[i] / 2, center[i] + size[i] / 2,
                         int(resolution[i])) for i in range(3)]
    gx, gy, gz = jnp.meshgrid(*axes, indexing='ij')
    return jnp.stack([gx, gy, gz], axis=-1)


def project_heatmaps_to_voxels(heatmaps, cameras, grid):
    """Aggregate multiview 2D heatmaps into a voxel volume.

    heatmaps: [V, K, H, W] per-view heatmaps (heatmap-pixel space).
    cameras: list of V SimpleCamera whose camera_to_pixel lands in heatmap
      pixels (pre-scale intrinsics accordingly).
    grid: [X, Y, Z, 3] world coordinates.

    Returns [X, Y, Z, K] averaged sampled responses (bilinear, zeros
    outside).
    """
    v, k, h, w = heatmaps.shape
    pts = grid.reshape(-1, 3)
    acc = jnp.zeros((pts.shape[0], k), jnp.float32)
    for vi, cam in enumerate(cameras):
        pix = cam.camera_to_pixel(cam.world_to_camera(pts))    # [P, 2]
        x, y = pix[..., 0], pix[..., 1]
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx, fy = x - x0, y - y0
        x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
        hm = heatmaps[vi].reshape(k, h * w)

        def samp(xi, yi):
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
            vals = hm[:, idx].T                              # [P, K]
            return jnp.where(valid[:, None], vals, 0.0)

        val = (samp(x0i, y0i) * (1 - fx)[:, None] * (1 - fy)[:, None]
               + samp(x0i + 1, y0i) * fx[:, None] * (1 - fy)[:, None]
               + samp(x0i, y0i + 1) * (1 - fx)[:, None] * fy[:, None]
               + samp(x0i + 1, y0i + 1) * fx[:, None] * fy[:, None])
        acc = acc + val
    return (acc / v).reshape(grid.shape[:3] + (k,))


def stack_camera_params(cameras):
    """Stack V SimpleCameras into plain arrays so the projection can run
    INSIDE jit/vmap (cameras become batch data instead of trace-time
    constants — the per-frame camera objects force a retrace per scene,
    and cannot batch over a `data`-sharded frame axis).

    Distortion is normalized to the rational-6 form: k padded to 6 with
    zeros (denominator 1 == plain radial-3), k=p=0 == no distortion.
    """
    def k6(cam):
        if getattr(cam, 'has_dist', False):
            kk = np.zeros(6, np.float32)
            kv = np.asarray(cam.k, np.float32).ravel()
            kk[:kv.shape[0]] = kv
            return kk
        return np.zeros(6, np.float32)

    def p2(cam):
        if getattr(cam, 'has_dist', False):
            return np.asarray(cam.p, np.float32).ravel()[:2]
        return np.zeros(2, np.float32)

    return dict(
        R=jnp.stack([jnp.asarray(c.R_w2c) for c in cameras]),   # [V,3,3]
        T=jnp.stack([jnp.asarray(c.T_w2c) for c in cameras]),   # [V,1,3]
        K=jnp.stack([jnp.asarray(c.K) for c in cameras]),       # [V,3,2]
        k=jnp.asarray(np.stack([k6(c) for c in cameras])),      # [V,6]
        p=jnp.asarray(np.stack([p2(c) for c in cameras])),      # [V,2]
    )


def project_points_pix(pts, cp):
    """World points -> pixel coords for ALL views at once.

    pts [P, 3]; cp from stack_camera_params -> [V, P, 2]. Same math as
    SimpleCamera.world_to_camera + camera_to_pixel (ops/camera.py:51,59),
    vectorized over the view axis."""
    xc = jnp.einsum('pi,vij->vpj', jnp.asarray(pts, jnp.float32),
                    cp['R']) + cp['T']                    # [V,P,3]
    v = xc / xc[..., 2:]
    v2 = v[..., :2]
    r2 = jnp.sum(v2 ** 2, axis=-1)                        # [V,P]
    k, p = cp['k'], cp['p']
    num = (1.0 + k[:, 0:1] * r2 + k[:, 1:2] * r2 ** 2
           + k[:, 2:3] * r2 ** 3)
    den = (1.0 + k[:, 3:4] * r2 + k[:, 4:5] * r2 ** 2
           + k[:, 5:6] * r2 ** 3)
    radial = num / den
    tangential = 2.0 * (p[:, 1:2] * v[..., 0] + p[:, 0:1] * v[..., 1])
    v2 = (v2 * (radial + tangential)[..., None]
          + r2[..., None] * p[:, None, ::-1])
    v = jnp.concatenate([v2, v[..., 2:]], axis=-1)
    return jnp.einsum('vpi,vij->vpj', v, cp['K'])         # [V,P,2]


def project_heatmaps_to_voxels_arr(heatmaps, cp, grid):
    """project_heatmaps_to_voxels with array cameras: all views sampled in
    one vectorized gather (no python view loop), jit/vmap-safe over a
    frame batch. heatmaps [V, K, H, W]; grid [..., 3] -> [..., K]."""
    v, k, h, w = heatmaps.shape
    pts = grid.reshape(-1, 3)
    pix = project_points_pix(pts, cp)                     # [V,P,2]
    x, y = pix[..., 0], pix[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx, fy = x - x0, y - y0
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    hm = heatmaps.reshape(v, k, h * w)

    def samp(xi, yi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)   # [V,P]
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take_along_axis(hm, idx[:, None, :], axis=2)  # [V,K,P]
        return jnp.where(valid[:, None, :], vals, 0.0)

    val = (samp(x0i, y0i) * (1 - fx)[:, None] * (1 - fy)[:, None]
           + samp(x0i + 1, y0i) * fx[:, None] * (1 - fy)[:, None]
           + samp(x0i, y0i + 1) * (1 - fx)[:, None] * fy[:, None]
           + samp(x0i + 1, y0i + 1) * fx[:, None] * fy[:, None])
    acc = jnp.mean(val, axis=0)                           # [K,P]
    return acc.T.reshape(grid.shape[:-1] + (k,))


class _Basic3D(nn.Module):
    """conv(k)+BN+ReLU with bias (reference v2v_net.py:14 Basic3DBlock)."""
    ch: int
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        pad = (self.kernel - 1) // 2
        y = nn.Conv(self.ch, (self.kernel,) * 3, padding=pad,
                    dtype=self.dtype, name='conv')(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='bn')(y)
        return nn.relu(y)


class _Res3D(nn.Module):
    """Residual 3D block (reference v2v_net.py:49 Res3DBlock):
    [conv+BN+ReLU, conv+BN] + (1x1 conv+BN skip when channels change),
    joined by ReLU."""
    ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        y = nn.Conv(self.ch, (3, 3, 3), padding=1, dtype=self.dtype,
                    name='conv1')(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='bn1')(y)
        y = nn.relu(y)
        y = nn.Conv(self.ch, (3, 3, 3), padding=1, dtype=self.dtype,
                    name='conv2')(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='bn2')(y)
        if x.shape[-1] == self.ch:
            skip = x
        else:
            skip = nn.Conv(self.ch, (1, 1, 1), dtype=self.dtype,
                           name='skip_conv')(x)
            skip = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype,
                                name='skip_bn')(skip)
        return nn.relu(y + skip)


class _Up3D(nn.Module):
    """ConvTranspose(2,2)+BN+ReLU (reference v2v_net.py:114
    Upsample3DBlock)."""
    ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        y = nn.ConvTranspose(self.ch, (2, 2, 2), strides=(2, 2, 2),
                             padding='VALID', transpose_kernel=True,
                             dtype=self.dtype, name='deconv')(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='bn')(y)
        return nn.relu(y)


class V2VNet(nn.Module):
    """3D conv hourglass over [N, X, Y, Z, C] volumes (reference
    v2v_net.py:212 `V2VNet`): 7^3 basic front block + residual front,
    two-level pooled encoder with residual skip paths, mid residual
    block, transposed-conv decoder, 1^3 output conv. NDHWC so every 3D
    conv lowers to an MXU contraction over the channel axis."""
    mid_channels: int = 32
    out_channels: int = 15
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.mid_channels
        x = _Basic3D(c // 2, kernel=7, dtype=self.dtype,
                     name='front_basic')(x, train)
        x = _Res3D(c, dtype=self.dtype, name='front_res')(x, train)
        s1 = _Res3D(c, dtype=self.dtype, name='skip_res1')(x, train)
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        x = _Res3D(c * 2, dtype=self.dtype, name='encoder_res1')(x, train)
        s2 = _Res3D(c * 2, dtype=self.dtype, name='skip_res2')(x, train)
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        x = _Res3D(c * 4, dtype=self.dtype, name='encoder_res2')(x, train)
        x = _Res3D(c * 4, dtype=self.dtype, name='mid_res')(x, train)
        x = _Res3D(c * 4, dtype=self.dtype, name='decoder_res2')(x, train)
        x = _Up3D(c * 2, dtype=self.dtype,
                  name='decoder_upsample2')(x, train) + s2
        x = _Res3D(c * 2, dtype=self.dtype, name='decoder_res1')(x, train)
        x = _Up3D(c, dtype=self.dtype,
                  name='decoder_upsample1')(x, train) + s1
        return nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype,
                       name='output_layer')(x)


class CuboidCenterHead(nn.Module):
    """Person-center 3D heatmap over the whole space; returns top-N local
    maxima as proposals (host decode)."""
    mid_channels: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return V2VNet(self.mid_channels, 1, dtype=self.dtype,
                      name='v2v')(x, train=train)[..., 0]

    @staticmethod
    def get_proposals(center_volume, grid, max_people=10, threshold=0.1):
        """center_volume [X, Y, Z] -> list of (world_xyz, score)."""
        vol = np.asarray(center_volume)
        g = np.asarray(grid)
        flat = vol.ravel()
        order = np.argsort(-flat)[:max_people]
        out = []
        for idx in order:
            if flat[idx] < threshold:
                break
            out.append((g.reshape(-1, 3)[idx], float(flat[idx])))
        return out


class CuboidPoseHead(nn.Module):
    """Per-joint 3D heatmaps + soft-argmax readout (reference
    voxelpose_head.py `CuboidPoseHead` with beta-scaled softmax)."""
    num_joints: int = 15
    beta: float = 100.0
    mid_channels: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, grid, train: bool = False):
        """x [N, X, Y, Z, C], grid [X, Y, Z, 3] (shared) or
        [N, X, Y, Z, 3] (per-sample cube grids, the batched training
        path) -> joints [N, K, 3]."""
        vol = V2VNet(self.mid_channels, self.num_joints,
                     dtype=self.dtype, name='v2v')(x, train=train)
        n = vol.shape[0]
        flat = vol.reshape(n, -1, self.num_joints)
        w = jax.nn.softmax(self.beta * flat, axis=1)         # [N, P, K]
        if grid.ndim == 5:
            pts = grid.reshape(n, -1, 3)                     # [N, P, 3]
            return jnp.einsum('npk,npd->nkd', w, pts)
        pts = grid.reshape(-1, 3)                            # [P, 3]
        return jnp.einsum('npk,pd->nkd', w, pts)


class DetectAndRegress:
    """Full multiview 3D pipeline (reference multiview_pose.py
    `DetectAndRegress`): per-view 2D heatmaps (any 2D pose model) ->
    multiview voxel aggregation over the whole space -> center proposals ->
    per-proposal fine voxel grids -> CuboidPoseHead 3D joints.
    """

    def __init__(self, num_joints=15, space_center=(0, 0, 1000),
                 space_size=(8000, 8000, 2000), space_resolution=(40, 40, 16),
                 cube_size=(800, 800, 800), cube_resolution=(16, 16, 16),
                 mid_channels=16, beta=100.0, max_people=10,
                 center_threshold=0.1):
        self.num_joints = num_joints
        self.space_center = space_center
        self.space_size = space_size
        self.space_resolution = space_resolution
        self.cube_size = cube_size
        self.cube_resolution = cube_resolution
        self.max_people = max_people
        self.center_threshold = center_threshold
        self.center_head = CuboidCenterHead(mid_channels=mid_channels)
        self.pose_head = CuboidPoseHead(num_joints=num_joints, beta=beta,
                                        mid_channels=mid_channels)
        self.space_grid = make_voxel_grid(space_center, space_size,
                                          space_resolution)

    def init(self, rng):
        import jax
        space_vol = jnp.zeros((1,) + tuple(self.space_resolution)
                              + (self.num_joints,))
        cube_vol = jnp.zeros((1,) + tuple(self.cube_resolution)
                             + (self.num_joints,))
        cube_grid = make_voxel_grid((0, 0, 0), self.cube_size,
                                    self.cube_resolution)
        k1, k2 = jax.random.split(rng)
        return {
            'center': self.center_head.init(k1, space_vol, train=False),
            'pose': self.pose_head.init(k2, cube_vol, cube_grid,
                                        train=False),
        }

    def training_losses(self, variables, heatmaps, cameras, candidates,
                        cand_mask, gt_joints, gt_vis, targets_3d,
                        train=True):
        """Single-scene training losses (reference multiview_pose.py:818
        `VoxelCenterDetector.forward_train` + :519
        `VoxelSinglePose.forward_train`).

        Args:
          heatmaps: [V, K, H, W] per-view 2D heatmaps; cameras as in
            `forward`.
          candidates: [P, 3] metric person-center candidates (gt-assigned
            at train time); cand_mask [P] 1.0 for valid candidates.
          gt_joints: [P, K, 3] metric joints per candidate's assigned gt;
            gt_vis [P, K] visibility.
          targets_3d: [X, Y, Z] center-heatmap target from
            `ops.target.generate_voxel_3d_targets` on the gt roots.

        Returns (losses dict(loss_center MSE, loss_pose weighted L1),
        updated variables — BatchNorm statistics advance when train=True).
        """
        space_vol = project_heatmaps_to_voxels(heatmaps, cameras,
                                               self.space_grid)
        new_vars = dict(variables)
        if train:
            center_pred, upd = self.center_head.apply(
                variables['center'], space_vol[None], train=True,
                mutable=['batch_stats'])
            new_vars['center'] = {**variables['center'], **upd}
        else:
            center_pred = self.center_head.apply(variables['center'],
                                                 space_vol[None],
                                                 train=False)
        loss_center = jnp.mean((center_pred[0]
                                - jnp.asarray(targets_3d)) ** 2)

        cand_mask = jnp.asarray(cand_mask, jnp.float32)
        gt_vis = jnp.asarray(gt_vis, jnp.float32)
        pose_abs = 0.0
        pose_cnt = 0.0
        pose_vars = variables['pose']
        for p in range(int(candidates.shape[0])):
            cube_grid = make_voxel_grid(candidates[p], self.cube_size,
                                        self.cube_resolution)
            cube_vol = project_heatmaps_to_voxels(heatmaps, cameras,
                                                  cube_grid)
            if train:
                joints, upd = self.pose_head.apply(
                    pose_vars, cube_vol[None], cube_grid, train=True,
                    mutable=['batch_stats'])
                pose_vars = {**pose_vars, **upd}
            else:
                joints = self.pose_head.apply(pose_vars, cube_vol[None],
                                              cube_grid, train=False)
            w = cand_mask[p] * gt_vis[p][:, None]            # [K, 1]
            pose_abs = pose_abs + jnp.sum(
                jnp.abs((joints[0] - jnp.asarray(gt_joints[p])) * w))
            pose_cnt = pose_cnt + cand_mask[p] * joints[0].size
        new_vars['pose'] = pose_vars
        loss_pose = pose_abs / jnp.maximum(pose_cnt, 1.0)
        return (dict(loss_center=loss_center, loss_pose=loss_pose),
                new_vars)

    def training_losses_batched(self, variables, heatmaps, cam_params,
                                candidates, cand_mask, gt_joints, gt_vis,
                                targets_3d, train=True):
        """Frame-BATCHED training losses — the TPU-native training path.

        Where `training_losses` processes one scene (and a python loop
        over candidates, each a batch-of-1 head forward), this stacks G
        frames and runs the center net on a [G] batch and the pose net on
        ONE [G*P] batch — the same proposal batching the reference's
        VoxelSinglePose.forward_train does (multiview_pose.py:519 runs all
        proposals through the pose net together). BN statistics therefore
        reduce over the global frame/proposal batch (sync-BN,
        docs/parallelism.md); padded candidate slots (cand_mask 0) are
        masked out of the loss but do enter BN statistics — pad candidates
        with in-space centers.

        Args:
          heatmaps: [G, V, K, H, W]; cam_params: stack_camera_params
            leaves with a leading [G, V, ...] frame axis.
          candidates [G, P, 3]; cand_mask [G, P]; gt_joints [G, P, K, 3];
          gt_vis [G, P, K]; targets_3d [G, X, Y, Z].
        Returns (losses, updated variables) like `training_losses`.
        """
        g, p = candidates.shape[:2]
        proj_space = jax.vmap(
            lambda hm, cp: project_heatmaps_to_voxels_arr(
                hm, cp, self.space_grid))
        space_vols = proj_space(heatmaps, cam_params)     # [G,X,Y,Z,K]
        new_vars = dict(variables)
        if train:
            center_pred, upd = self.center_head.apply(
                variables['center'], space_vols, train=True,
                mutable=['batch_stats'])
            new_vars['center'] = {**variables['center'], **upd}
        else:
            center_pred = self.center_head.apply(variables['center'],
                                                 space_vols, train=False)
        loss_center = jnp.mean((center_pred
                                - jnp.asarray(targets_3d)) ** 2)

        # per-candidate cube grids: fixed offsets + traced centers
        offsets = make_voxel_grid((0, 0, 0), self.cube_size,
                                  self.cube_resolution)   # [Xc,Yc,Zc,3]
        grids = (jnp.asarray(candidates, jnp.float32)
                 [:, :, None, None, None, :] + offsets)   # [G,P,Xc,Yc,Zc,3]
        proj_cubes = jax.vmap(                            # over G
            lambda hm, cp, gr: jax.vmap(                  # over P
                lambda g1: project_heatmaps_to_voxels_arr(hm, cp, g1)
            )(gr))
        cube_vols = proj_cubes(heatmaps, cam_params, grids)
        cube_vols = cube_vols.reshape((g * p,) + cube_vols.shape[2:])
        grids_flat = grids.reshape((g * p,) + grids.shape[2:])
        if train:
            joints, upd = self.pose_head.apply(
                variables['pose'], cube_vols, grids_flat, train=True,
                mutable=['batch_stats'])
            new_vars['pose'] = {**variables['pose'], **upd}
        else:
            joints = self.pose_head.apply(variables['pose'], cube_vols,
                                          grids_flat, train=False)
        joints = joints.reshape(g, p, self.num_joints, 3)
        cand_mask = jnp.asarray(cand_mask, jnp.float32)
        gt_vis = jnp.asarray(gt_vis, jnp.float32)
        w = cand_mask[..., None, None] * gt_vis[..., None]  # [G,P,K,1]
        pose_abs = jnp.sum(jnp.abs((joints - jnp.asarray(gt_joints)) * w))
        # count matches training_losses: full joint size per valid
        # candidate regardless of per-joint visibility
        pose_cnt = jnp.sum(cand_mask) * self.num_joints * 3
        loss_pose = pose_abs / jnp.maximum(pose_cnt, 1.0)
        return (dict(loss_center=loss_center, loss_pose=loss_pose),
                new_vars)

    def forward(self, variables, heatmaps, cameras):
        """heatmaps [V, K, H, W] (single scene) + cameras -> list of
        (joints_3d [K, 3], score)."""
        space_vol = project_heatmaps_to_voxels(heatmaps, cameras,
                                               self.space_grid)
        center_vol = self.center_head.apply(variables['center'],
                                            space_vol[None], train=False)
        proposals = CuboidCenterHead.get_proposals(
            np.asarray(center_vol)[0], self.space_grid,
            max_people=self.max_people, threshold=self.center_threshold)
        people = []
        for center_xyz, score in proposals:
            cube_grid = make_voxel_grid(center_xyz, self.cube_size,
                                        self.cube_resolution)
            cube_vol = project_heatmaps_to_voxels(heatmaps, cameras,
                                                  cube_grid)
            joints = self.pose_head.apply(variables['pose'],
                                          cube_vol[None], cube_grid,
                                          train=False)
            people.append((np.asarray(joints)[0], score))
        return people

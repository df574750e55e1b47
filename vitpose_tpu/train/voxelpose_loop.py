"""VoxelPose training loop: panoptic multiview frames -> center/pose nets.

Counterpart of the reference VoxelPose training
(mmpose/models/detectors/multiview_pose.py `VoxelCenterDetector.
forward_train` + `VoxelSinglePose.forward_train` driven by
GenerateVoxel3DHeatmapTarget targets). The 3D half of VoxelPose always
learns from per-view 2D heatmaps; `heatmap_source` selects where those
come from:

  * 'gt' (default) — gaussians painted at the GT projections, the
    frozen-perfect-2D-backbone regime (the reference's panoptic recipe
    trains with a frozen pretrained 2D model; GT painting is that
    regime's fixture-friendly limit).
  * a callable (frame, cameras) -> [V, K, H, W] — plug in a real 2D
    model's heatmaps.

Per frame the step builds the space voxel volume, trains the center net
against the voxel-gaussian root target, and trains the pose net on
gt-centered cube proposals with the weighted-L1 joint loss (the
reference's gt-assigned-candidate regime).
"""
from __future__ import annotations

from typing import Callable, Optional, Union

import numpy as np

from ..data.panoptic_mview import PanopticMviewDataset
from ..ops.target import generate_voxel_3d_targets
from .interhand_loop import (_log_val_stats, _save_best_ckpt,
                             _save_loop_outputs, _should_eval)


def heatmap_frame_cameras(cameras, heatmap_size):
    """Rescale each camera's intrinsics from its sensor resolution to
    heatmap pixels (the frame project_heatmaps_to_voxels requires; the
    reference's project_layer divides projected coords by image size and
    multiplies by heatmap size, multiview_pose.py project_layer)."""
    h, w = heatmap_size
    out = []
    for cam in cameras:
        rw, rh = getattr(cam, 'resolution', (1920, 1080))
        out.append(cam.scaled(w / float(rw), h / float(rh)))
    return out


def gt_projected_heatmaps(frame, cameras, num_joints, heatmap_size,
                          sigma_px=2.0):
    """[V, K, H, W] gaussians at each camera's GT-joint projections
    (all people max-combined). `cameras` must already be in the heatmap
    pixel frame (heatmap_frame_cameras)."""
    h, w = heatmap_size
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    maps = np.zeros((len(cameras), num_joints, h, w), np.float32)
    for vi, cam in enumerate(cameras):
        for person in frame['people']:
            pts = np.asarray(cam.camera_to_pixel(cam.world_to_camera(
                person['joints_3d'])))
            vis = person['joints_vis'] > 0
            for k in range(min(num_joints, pts.shape[0])):
                if not vis[k]:
                    continue
                g = np.exp(-((xs - pts[k, 0]) ** 2 + (ys - pts[k, 1]) ** 2)
                           / (2 * sigma_px ** 2))
                maps[vi, k] = np.maximum(maps[vi, k], g)
    return maps


def train_voxelpose_model(cfg: dict, work_dir: Optional[str] = None,
                          resume: bool = False,
                          max_steps: Optional[int] = None,
                          heatmap_source: Union[str, Callable] = 'gt'):
    """Train a voxelpose config (see
    configs/body3d/voxelpose_prn64x64x64_cpn80x80x20_panoptic_cam5.py).
    Returns (variables, last-step losses)."""
    import jax
    import jax.numpy as jnp
    import optax
    from .loop import build_model_from_cfg

    model = build_model_from_cfg(cfg['model'])
    dcfg = cfg['data']
    tcfg = cfg.get('target', {})
    train_cfg = dcfg.get('train', {})
    seq_dirs = train_cfg.get('seq_dirs') or [
        str(p) for p in train_cfg.get('seq_list', [])]
    ds = PanopticMviewDataset(seq_dirs,
                              cam_names=train_cfg.get('cam_names'),
                              num_joints=cfg['model'].get('num_joints', 15))
    hm_size = tuple(train_cfg.get('heatmap_size',
                                  dcfg.get('heatmap_size', (64, 64))))[::-1]
    sigma_mm = tcfg.get('sigma', 200.0)

    ocfg = cfg.get('optimizer', {})
    tx = optax.adam(ocfg.get('base_lr', 1e-4))
    variables = model.init(jax.random.PRNGKey(cfg.get('seed', 0)))
    from .interhand_loop import _resume_loop_weights
    variables, _ = _resume_loop_weights(cfg, work_dir, variables, resume)
    # only the 'params' collections are trainable; BatchNorm statistics
    # advance through training_losses(train=True), not through gradients
    trainable = {k: variables[k]['params'] for k in variables}
    stats = {k: {c: v for c, v in variables[k].items() if c != 'params'}
             for k in variables}
    opt_state = tx.init(trainable)

    def _rebuild(trainable, stats):
        return {k: {**stats[k], 'params': trainable[k]} for k in trainable}

    def batch_losses(trainable_tree, stats, batch):
        # ONE train-mode forward: BN normalizes by batch statistics (the
        # running stats leave the gradient graph) and the advanced stats
        # come back as aux — no second stats-only pass needed
        losses, new_vars = model.training_losses_batched(
            _rebuild(trainable_tree, stats), batch['heatmaps'],
            batch['cam'], batch['candidates'], batch['cand_mask'],
            batch['gt_joints'], batch['gt_vis'], batch['targets_3d'],
            train=True)
        return (losses['loss_center'] + losses['loss_pose'],
                (losses, new_vars))

    def train_step(trainable, stats, opt_state, batch):
        (total, (losses, new_vars)), grads = jax.value_and_grad(
            batch_losses, has_aux=True)(trainable, stats, batch)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        stats = {k: {c: v for c, v in new_vars[k].items() if c != 'params'}
                 for k in new_vars}
        return (trainable, stats, opt_state,
                dict(losses, total_loss=total))

    root_id = cfg['model'].get('root_id', 2)   # reference panoptic config
    # frame-batched + data-parallel over the mesh (the reference trains
    # voxelpose under DDP with per-GPU frame batches): G frames stack
    # into one step; cameras travel as stacked arrays (models/voxelpose.py
    # stack_camera_params) so the step stays retrace-free and shardable
    import math
    from ..models.voxelpose import stack_camera_params
    from ..parallel.mesh import make_mesh, data_parallel_step
    g_frames = dcfg.get('batch_size', 1)
    max_p = cfg['model'].get('max_people_train',
                             cfg['model'].get('max_people', 10))
    n_data = cfg.get('runtime', {}).get('n_data') or math.gcd(
        g_frames, jax.device_count())
    dp_mesh = make_mesh(n_data=n_data, n_expert=1,
                        devices=jax.devices()[:n_data])
    step_j, place_batch = data_parallel_step(train_step, dp_mesh,
                                             n_args=4, batch_argnums={3})

    def frame_arrays(frame):
        """One frame -> fixed-shape arrays (people padded to max_p)."""
        cameras = heatmap_frame_cameras(frame['cameras'], hm_size)
        people = [p for p in frame['people']
                  if (p['joints_vis'] > 0).any()][:max_p]
        if not cameras or not people:
            return None
        gt_joints = np.stack([p['joints_3d'] for p in people])
        gt_vis = np.stack([(p['joints_vis'] > 0).astype(np.float32)
                           for p in people])
        # person center = root_id (panoptic coco19: 2 = mid-hip/body
        # center, reference voxelpose config root_id=2 — index 0 is
        # the neck, which would push leg joints outside the pose cube)
        roots = gt_joints[:, root_id]
        if callable(heatmap_source):
            heatmaps = heatmap_source(frame, cameras)
        else:
            heatmaps = gt_projected_heatmaps(
                frame, cameras, model.num_joints, hm_size)
        targets_3d = generate_voxel_3d_targets(
            roots[:, None], np.ones(roots.shape[:1] + (1, 1)),
            model.space_size, model.space_center,
            model.space_resolution, sigma=sigma_mm, joint_indices=[0])
        npad = max_p - len(people)
        k = gt_joints.shape[1]
        # pad candidate slots with the space center: the cube volume
        # stays in-bounds (enters BN statistics), the loss is masked
        pad_root = np.tile(np.asarray(model.space_center, np.float32),
                           (npad, 1))
        return dict(
            heatmaps=np.asarray(heatmaps, np.float32),
            cam=jax.tree.map(np.asarray, stack_camera_params(cameras)),
            candidates=np.concatenate(
                [roots, pad_root]).astype(np.float32),
            cand_mask=np.concatenate(
                [np.ones(len(people)), np.zeros(npad)]).astype(np.float32),
            gt_joints=np.concatenate(
                [gt_joints, np.zeros((npad, k, 3))]).astype(np.float32),
            gt_vis=np.concatenate(
                [gt_vis, np.zeros((npad, k))]).astype(np.float32),
            targets_3d=np.asarray(targets_3d, np.float32),
        )

    metrics = {}
    n_steps = 0
    best = None
    epochs = ocfg.get('total_epochs', 15)
    pending = []
    for _epoch in range(epochs):
        for idx in range(len(ds)):
            fa = frame_arrays(ds[idx])
            if fa is None:
                continue
            if pending and any(
                    fa[kk].shape != pending[0][kk].shape
                    for kk in ('heatmaps',)):
                continue          # mixed view counts can't stack
            pending.append(fa)
            if len(pending) < g_frames:
                continue
            batch = jax.tree.map(lambda *xs: np.stack(xs), *pending)
            pending = []
            trainable, stats, opt_state, losses = step_j(
                trainable, stats, opt_state, place_batch(batch))
            metrics = {k: float(v) for k, v in losses.items()}
            n_steps += 1
            if max_steps is not None and n_steps >= max_steps:
                variables = _rebuild(trainable, stats)
                _save_loop_outputs(cfg, work_dir, variables, metrics,
                                   n_steps)
                return variables, metrics
        if _should_eval(cfg, _epoch):
            from ..eval.families import evaluate_voxelpose
            stats_val = evaluate_voxelpose(cfg, model,
                                           _rebuild(trainable, stats))
            _log_val_stats(cfg, work_dir, stats_val, _epoch + 1)
            best = _save_best_ckpt(cfg, work_dir, stats_val,
                                   _rebuild(trainable, stats), best)
    variables = _rebuild(trainable, stats)
    _save_loop_outputs(cfg, work_dir, variables, metrics, n_steps)
    return variables, metrics

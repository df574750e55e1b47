"""PoseLifter (VideoPose3D) training loop, config-driven.

Counterpart of the reference pose-lift training (PoseLifter detector,
mmpose/models/detectors/pose_lifter.py, with Body3DH36MDataset 2D->3D
windows). One jit step: TCN forward over [N, T, K, 2] windows -> MPJPE
loss on root-relative 3D -> Adam with per-epoch exponential lr decay
(the VideoPose3D recipe's `lr_decay`).

Input protocol follows the reference pipelines
(configs/.../videopose3d_h36m_27frames_fullconv_supervised.py:73-97):
ImageCoordinateNormalization of the 2D input by the frame's camera
sensor, GetRootCenteredPose on the 3D target, and the 50%-probability
RelativeJointRandomFlip train augmentation (input mirrored around the
normalized x=0 center, target around the root x).

With ``data.semi_supervised`` (+ ``model.with_traj``) the loop runs the
VideoPose3D semi-supervised recipe (reference
videopose3d_h36m_27frames_fullconv_semi-supervised.py): labeled MPJPE +
trajectory-head MPJPE on the global root, plus warmup-gated
projection/bone-consistency losses on an unlabeled stream whose targets
are its own 2D detections re-projected through per-frame normalized
camera intrinsics (SemiSupervisionLoss, regression_loss.py:360).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..data.body3d import (Body3DH36MDataset, flip_relative_pose)
from .interhand_loop import (_log_val_stats, _resume_loop_weights,
                             _save_best_ckpt, _save_loop_outputs,
                             _should_eval)


def _flip_pairs(dcfg):
    from ..data import DatasetInfo
    return DatasetInfo.load(dcfg.get('dataset', 'h36m')).flip_pairs


def _build_dataset(dcfg, entry):
    return Body3DH36MDataset(
        entry['ann_file'], seq_len=dcfg.get('seq_len', 27),
        seq_frame_interval=dcfg.get('seq_frame_interval', 1),
        causal=dcfg.get('causal', False), det_file=entry.get('det_file'),
        camera_param_file=entry.get('camera_param_file'))


def _labeled_batch(ds, idxs, flip_pairs, rng, norm2d=None, norm3d=None,
                   remove_root=False):
    """[input_2d (normalized), target (root-centered), root] with the
    reference 50% RelativeJointRandomFlip when `rng` is given.

    `norm2d`/`norm3d` are (mean, std) NormalizeJointCoordinate params
    (the SimpleBaseline3D recipe): the 2D input is stats-normalized in
    raw pixel coords INSTEAD of camera-normalized, the root-centered 3D
    target is stats-normalized and (remove_root) drops the root row.
    Flip augmentation is only valid in the camera-normalized space
    (mirroring whitened per-joint coords around x=0 is meaningless — and
    the reference stats-normalized recipe has no flip), so norm2d
    disables it."""
    if norm2d is not None:
        rng = None
    xs, ys, roots = [], [], []
    for i in idxs:
        s = ds[int(i)]
        if norm2d is not None:
            x = ((np.asarray(s['input_2d'], np.float32) - norm2d[0])
                 / norm2d[1])
        else:
            x = ds.normalize_2d(s['input_2d'], s['target_idx'])
        y = np.asarray(s['target_3d'], np.float32)
        root = y[:1].copy()
        y = y - root
        if rng is not None and rng.rand() < 0.5:
            x = flip_relative_pose(x, flip_pairs)       # static center x=0
            y = flip_relative_pose(y, flip_pairs)       # root x = 0
        if remove_root:
            y = y[1:]
        if norm3d is not None:
            y = (y - norm3d[0]) / norm3d[1]
        xs.append(x)
        ys.append(y)
        roots.append(root)
    return (np.stack(xs), np.stack(ys), np.stack(roots))


def _unlabeled_batch(ds, idxs, flip_pairs, rng):
    """[input_2d (normalized), target_2d (normalized detections at the
    target frame), intrinsics (normalized)] with flip_camera semantics
    (c_x negated alongside the mirrored joints,
    pose3d_transform.py:289-293)."""
    xs, t2ds, intrs = [], [], []
    for i in idxs:
        s = ds[int(i)]
        ti = s['target_idx']
        x = ds.normalize_2d(s['input_2d'], ti)
        t2d = ds.normalize_2d(np.asarray(s['input_2d'])[
            -1 if ds.causal else len(s['input_2d']) // 2], ti)
        intr = ds.normalized_intrinsics(ti)
        if rng is not None and rng.rand() < 0.5:
            x = flip_relative_pose(x, flip_pairs)
            t2d = flip_relative_pose(t2d, flip_pairs)
            intr = intr.copy()
            intr[2] = -intr[2]                           # flip_camera: c_x
        xs.append(x)
        t2ds.append(t2d)
        intrs.append(intr)
    return np.stack(xs), np.stack(t2ds), np.stack(intrs)


def train_pose_lifter_model(cfg: dict, work_dir: Optional[str] = None,
                            resume: bool = False,
                            max_steps: Optional[int] = None):
    """Train a pose_lifter config (see
    configs/body3d/videopose3d_h36m_27frames.py). Returns
    (variables, last-step metrics)."""
    import jax
    import jax.numpy as jnp
    import optax
    from .loop import build_model_from_cfg
    from ..models.losses_regression import (mpjpe_loss, mse_loss,
                                            semi_supervision_loss)

    model = build_model_from_cfg(cfg['model'])
    dcfg = cfg['data']
    semi = bool(dcfg.get('semi_supervised')) and \
        bool(cfg['model'].get('with_traj'))
    # SimpleBaseline3D protocol knobs (reference simplebaseline3d_h36m.py:
    # remove_root target + mean/std NormalizeJointCoordinate + MSE loss)
    from ..data.body3d import load_joint_normalize
    norm2d = load_joint_normalize(cfg.get('joint_2d_normalize'))
    norm3d = load_joint_normalize(cfg.get('joint_3d_normalize'))
    remove_root = bool(cfg['model'].get('remove_root'))
    loss_name = cfg['model'].get('loss', 'mpjpe')
    ds = _build_dataset(dcfg, dcfg['train'])
    ds_unlabeled = (_build_dataset(dcfg, dcfg.get('train_unlabeled',
                                                  dcfg['train']))
                    if semi else None)
    flip_pairs = _flip_pairs(dcfg)
    batch_size = dcfg.get('batch_size', 128)

    ocfg = cfg.get('optimizer', {})
    base_lr = ocfg.get('base_lr', 1e-3)
    lr_decay = ocfg.get('lr_decay', 1.0)
    total_epochs = ocfg.get('total_epochs', 160)
    steps_per_epoch = max(1, len(ds) // batch_size)
    # per-epoch exponential decay as a step schedule
    schedule = optax.exponential_decay(
        base_lr, transition_steps=steps_per_epoch, decay_rate=lr_decay,
        staircase=True)
    tx = optax.adam(schedule)

    scfg = cfg.get('loss_semi', {})
    warmup_iters = scfg.get('warmup_epochs', 5) * steps_per_epoch \
        if 'warmup_iterations' not in scfg else scfg['warmup_iterations']
    parents = scfg.get('joint_parents',
                       [0, 0, 1, 2, 0, 4, 5, 0, 7, 8, 9, 8, 11, 12, 8,
                        14, 15])

    rng = jax.random.PRNGKey(cfg.get('seed', 0))
    x0 = jnp.asarray(_labeled_batch(ds, [0], flip_pairs, None,
                                    norm2d=norm2d, norm3d=norm3d,
                                    remove_root=remove_root)[0])
    variables = model.init(rng, x0, train=False)
    variables, _ = _resume_loop_weights(cfg, work_dir, variables, resume)
    opt_state = tx.init(variables)

    def _apply(v, x, drop_rng):
        # train=True: BN normalizes by batch statistics (running stats
        # leave the gradient graph -> zero grads/updates) and dropout
        # fires; the mutated stats are merged back afterwards.
        return model.apply(v, x, train=True, mutable=['batch_stats'],
                           rngs={'dropout': drop_rng})

    sup_loss = mse_loss if loss_name == 'mse' else mpjpe_loss

    def step(variables, opt_state, x, y_rel, drop_rng):
        def loss_fn(v):
            out, upd = _apply(v, x, drop_rng)
            return sup_loss(out, y_rel), upd
        (loss, upd), grads = jax.value_and_grad(loss_fn,
                                                has_aux=True)(variables)
        updates, opt_state = tx.update(grads, opt_state, variables)
        variables = optax.apply_updates(variables, updates)
        return {**variables, **upd}, opt_state, dict(mpjpe_loss=loss)

    def step_semi(variables, opt_state, x, y_rel, root, xu, t2d, intr,
                  warm, drop_rng):
        def loss_fn(v):
            (pose, traj), upd = _apply(v, x, drop_rng)
            (upose, utraj), upd2 = _apply({**v, **upd}, xu,
                                          jax.random.fold_in(drop_rng, 1))
            l_pose = mpjpe_loss(pose, y_rel)
            l_traj = mpjpe_loss(traj, root)
            sl = semi_supervision_loss(
                pose, upose, utraj, t2d, intr, parents,
                projection_loss_weight=scfg.get('projection_loss_weight',
                                                1.0),
                bone_loss_weight=scfg.get('bone_loss_weight', 1.0),
                warmup=warm)
            total = l_pose + l_traj + sl['proj_loss'] + sl['bone_loss']
            return total, (upd2, dict(mpjpe_loss=l_pose, traj_loss=l_traj,
                                      **sl))
        (_, (upd, mets)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables)
        updates, opt_state = tx.update(grads, opt_state, variables)
        variables = optax.apply_updates(variables, updates)
        return {**variables, **upd}, opt_state, mets

    # data-parallel over the mesh (the reference trains the lifter under
    # DDP via tools/dist_train.sh): batch args shard over `data`,
    # variables/opt state replicated, XLA inserts the gradient psum
    import math
    from ..parallel.mesh import make_mesh, data_parallel_step
    n_data = cfg.get('runtime', {}).get('n_data') or \
        math.gcd(batch_size, jax.device_count())
    dp_mesh = make_mesh(n_data=n_data, n_expert=1,
                        devices=jax.devices()[:n_data])
    step, _place = data_parallel_step(step, dp_mesh, n_args=5,
                                      batch_argnums={2, 3})
    step_semi, _ = data_parallel_step(step_semi, dp_mesh, n_args=10,
                                      batch_argnums={2, 3, 4, 5, 6, 7})

    metrics = {}
    n_steps = 0
    done = False
    best = None
    order = np.arange(len(ds))
    for epoch in range(total_epochs):
        ep_rng = np.random.RandomState(cfg.get('seed', 0) + epoch)
        ep_rng.shuffle(order)
        for b in range(steps_per_epoch):
            idxs = order[b * batch_size:(b + 1) * batch_size]
            if len(idxs) < batch_size:    # static shapes: repeat-pad
                idxs = np.concatenate([idxs, order[:batch_size
                                                   - len(idxs)]])
            flip_rng = ep_rng if dcfg.get('flip_aug', True) else None
            x, y_rel, roots = _labeled_batch(
                ds, idxs, flip_pairs, flip_rng,
                norm2d=norm2d, norm3d=norm3d, remove_root=remove_root)
            drop = jax.random.fold_in(rng, n_steps)
            if semi:
                u_idxs = ep_rng.randint(0, len(ds_unlabeled), batch_size)
                xu, t2d, intr = _unlabeled_batch(ds_unlabeled, u_idxs,
                                                 flip_pairs, flip_rng)
                variables, opt_state, metrics = step_semi(
                    variables, opt_state, x, y_rel, roots, xu, t2d, intr,
                    float(n_steps >= warmup_iters), drop)
            else:
                variables, opt_state, metrics = step(
                    variables, opt_state, x, y_rel, drop)
            n_steps += 1
            if max_steps is not None and n_steps >= max_steps:
                done = True
                break
        if done:
            break
        if _should_eval(cfg, epoch):
            from ..eval.families import evaluate_pose_lifter
            stats_val = evaluate_pose_lifter(cfg, model, variables)
            _log_val_stats(cfg, work_dir, stats_val, epoch + 1)
            best = _save_best_ckpt(cfg, work_dir, stats_val, variables,
                                   best)
    metrics = {m: float(v) for m, v in metrics.items()}
    _save_loop_outputs(cfg, work_dir, variables, metrics, n_steps)
    return variables, metrics

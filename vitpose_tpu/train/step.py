"""Jit-compiled train / eval steps.

Replaces the reference's runner-driven `model.train_step`
(mmpose/models/detectors/base.py:78, top_down.py:143 `forward_train`) with
pure functions over TrainState. Differences by design:

  * PCK accuracy is computed ON DEVICE inside the step (the reference syncs
    heatmaps to host numpy every iteration,
    topdown_heatmap_simple_head.py:190-193 — a per-iter device->host stall).
  * Under a sharded jit (GSPMD) the gradient mean over the data axis is
    inserted by XLA; there is no explicit DDP/allreduce code.
  * ViTPose+ multi-dataset training: every head runs on the full batch and
    per-dataset losses are masked by `dataset_idx` (same gradient semantics
    as reference top_down_moe.py:166-203, but as one fused program).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..models.losses import joints_mse_loss, combined_target_mse_loss
from ..ops.decode import pose_pck_accuracy


def _apply_train(model, params, batch_stats, imgs, rng, expert_idx=None,
                 all_heads=False):
    variables = {'params': params}
    if batch_stats:
        variables['batch_stats'] = batch_stats
    out, mut = model.apply(
        variables, imgs, train=True, expert_idx=expert_idx,
        all_heads=all_heads, rngs={'droppath': rng},
        mutable=['batch_stats'] if batch_stats else [])
    new_stats = mut.get('batch_stats', batch_stats) if mut else batch_stats
    return out, new_stats


def _match_target(target, out):
    """Resize NCHW target to `out`'s spatial shape if they differ."""
    if target.shape[2:] == out.shape[2:]:
        return target
    return jax.image.resize(target, target.shape[:2] + out.shape[2:],
                            method='bilinear')


def make_train_step(model, target_type='GaussianHeatmap',
                    reg_loss='smooth_l1', heatmap_loss='mse'):
    """Single-dataset training step: (state, batch, rng) -> (state, metrics).

    batch: dict with imgs [N,H,W,3], target [N,K,Hh,Wh], target_weight [N,K].
    target_type='Regression' trains a coordinate-regression (DeepPose)
    head: target [N,K,2] normalized coords, `reg_loss` selects the
    criterion (reference deeppose configs: SmoothL1 for body, Wing /
    SoftWing for face). heatmap_loss='awing' swaps the heatmap criterion
    for AdaptiveWingLoss (reference res50_coco_256x192_awing.py).
    """
    if target_type.lower() == 'regression':
        return _make_regression_train_step(model, reg_loss)
    if target_type.lower() == 'combinedtarget':
        loss_f = combined_target_mse_loss
    elif heatmap_loss == 'awing':
        from ..models.losses import adaptive_wing_loss
        loss_f = adaptive_wing_loss
    else:
        loss_f = joints_mse_loss

    def train_step(state, batch, rng):
        def loss_fn(params):
            out, new_stats = _apply_train(
                model, params, state.batch_stats, batch['imgs'], rng,
                expert_idx=batch.get('expert_idx'))
            if isinstance(out, (list, tuple)):
                # multi-stage supervision: sum of per-stage losses
                # (reference multi_stage_head.py get_loss accumulates over
                # stages); units at lower resolution (MSPN/RSN MSMU) are
                # supervised against a bilinearly resized target.
                loss = sum(
                    loss_f(o, _match_target(batch['target'], o),
                           batch['target_weight']) for o in out)
                return loss, (new_stats, out[-1])
            loss = loss_f(out, batch['target'], batch['target_weight'])
            return loss, (new_stats, out)

        (loss, (new_stats, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_stats)
        metrics = {'heatmap_loss': loss,
                   'grad_norm': optax.global_norm(grads)}
        if target_type.lower() != 'combinedtarget':
            # PCK is only defined for Gaussian heatmaps — the
            # CombinedTarget output interleaves offset channels (3K), so
            # argmax decoding is meaningless there (the reference's
            # get_accuracy also skips it, topdown_heatmap_simple_head.py)
            acc, cnt = pose_pck_accuracy(out, batch['target'],
                                         batch['target_weight'] > 0)
            metrics['acc_pose'] = acc
        return new_state, metrics

    return train_step


def _make_regression_train_step(model, reg_loss='smooth_l1'):
    """DeepPose coordinate-regression step (reference
    DeepposeRegressionHead.get_loss/get_accuracy,
    deeppose_regression_head.py:48-95): criterion over [N,K,2] normalized
    coords + PCK@0.05 with unit normalization, computed on device."""
    from ..models.losses_regression import (smooth_l1_loss, wing_loss,
                                            soft_wing_loss)
    loss_f = {'smooth_l1': smooth_l1_loss, 'wing': wing_loss,
              'soft_wing': soft_wing_loss}[reg_loss]

    def train_step(state, batch, rng):
        def loss_fn(params):
            out, new_stats = _apply_train(
                model, params, state.batch_stats, batch['imgs'], rng,
                expert_idx=batch.get('expert_idx'))
            loss = loss_f(out, batch['target'], batch['target_weight'])
            return loss, (new_stats, out)

        (loss, (new_stats, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_stats)
        # keypoint_pck_accuracy(thr=0.05, normalize=ones) on device
        vis = batch['target_weight'][..., 0] > 0               # [N, K]
        dist = jnp.linalg.norm(out - batch['target'], axis=-1)  # [N, K]
        hits = jnp.sum(jnp.where(vis, (dist < 0.05).astype(jnp.float32),
                                 0.0))
        cnt = jnp.maximum(jnp.sum(vis.astype(jnp.float32)), 1.0)
        metrics = {'reg_loss': loss, 'heatmap_loss': loss,
                   'acc_pose': hits / cnt,
                   'grad_norm': optax.global_norm(grads)}
        return new_state, metrics

    return train_step


def make_moe_train_step(model, num_datasets):
    """ViTPose+ multi-dataset step. batch additionally carries
    `dataset_idx` [N] int; target is padded to max joints; each head's loss
    is masked to its dataset's samples (reference top_down_moe.py:177-201).
    """
    def train_step(state, batch, rng):
        ds_idx = batch['dataset_idx']

        def loss_fn(params):
            outs, new_stats = _apply_train(
                model, params, state.batch_stats, batch['imgs'], rng,
                expert_idx=ds_idx, all_heads=True)
            if len(outs) != num_datasets:
                raise ValueError(
                    f'model has {len(outs)} heads but num_datasets='
                    f'{num_datasets}: samples of unmatched datasets would '
                    f'silently contribute no loss')
            total = 0.0
            losses = {}
            for d, out in enumerate(outs):
                k = out.shape[1]
                mask = (ds_idx == d).astype(jnp.float32)     # [N]
                w = batch['target_weight'][:, :k] * mask[:, None]
                li = joints_mse_loss(out, batch['target'][:, :k], w)
                losses[f'loss_{d}'] = li
                total = total + li
            return total, (new_stats, losses)

        (loss, (new_stats, losses)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_stats)
        metrics = dict(losses)
        metrics['heatmap_loss'] = loss
        metrics['grad_norm'] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def make_eval_step(model, flip_index=None):
    """Eval step with flip test, returning NCHW heatmaps."""
    from ..models.topdown import infer

    def eval_step(variables, imgs, expert_idx=None):
        return infer(model, variables, imgs, flip_index=flip_index,
                     expert_idx=expert_idx)

    return eval_step


# kept as an alias for backward compatibility; optax.global_norm is the
# same quantity clip_by_global_norm acts on
optax_global_norm = optax.global_norm

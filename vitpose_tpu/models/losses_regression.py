"""Regression / classification / bone losses, pure jnp.

Counterparts of the reference loss zoo
(mmpose/models/losses/regression_loss.py, classfication_loss.py). All take
pred/target [N, K, D] (+ optional target_weight) and return a scalar with
the reference's reduction semantics (mean over batch of per-sample sums for
wing-style, elementwise mean for L1/MSE-style).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _maybe_weight(pred, target, target_weight):
    if target_weight is not None:
        w = jnp.asarray(target_weight)
        if w.ndim == pred.ndim - 1:
            w = w[..., None]
        return pred * w, target * w
    return pred, target


def smooth_l1_loss(pred, target, target_weight=None, loss_weight=1.0):
    """Huber (beta=1) elementwise mean (regression_loss.py:12)."""
    pred, target = _maybe_weight(pred, target, target_weight)
    d = jnp.abs(pred - target)
    loss = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)
    return jnp.mean(loss) * loss_weight


def l1_loss(pred, target, target_weight=None, loss_weight=1.0):
    pred, target = _maybe_weight(pred, target, target_weight)
    return jnp.mean(jnp.abs(pred - target)) * loss_weight


def mse_loss(pred, target, target_weight=None, loss_weight=1.0):
    pred, target = _maybe_weight(pred, target, target_weight)
    return jnp.mean((pred - target) ** 2) * loss_weight


def wing_loss(pred, target, target_weight=None, omega=10.0, epsilon=2.0,
              loss_weight=1.0):
    """Wing loss (Feng et al. CVPR'18; regression_loss.py:52)."""
    pred, target = _maybe_weight(pred, target, target_weight)
    c = omega * (1.0 - math.log(1.0 + omega / epsilon))
    d = jnp.abs(target - pred)
    loss = jnp.where(d < omega, omega * jnp.log(1.0 + d / epsilon), d - c)
    return jnp.mean(jnp.sum(loss, axis=(1, 2))) * loss_weight


def soft_wing_loss(pred, target, target_weight=None, omega1=2.0, omega2=20.0,
                   epsilon=0.5, loss_weight=1.0):
    """Soft wing loss (Lin et al. TIP'21; regression_loss.py:122)."""
    pred, target = _maybe_weight(pred, target, target_weight)
    b = omega1 - omega2 * math.log(1.0 + omega1 / epsilon)
    d = jnp.abs(target - pred)
    loss = jnp.where(d < omega1, d,
                     omega2 * jnp.log(1.0 + d / epsilon) + b)
    return jnp.mean(jnp.sum(loss, axis=(1, 2))) * loss_weight


def mpjpe_loss(pred, target, target_weight=None, loss_weight=1.0):
    """Mean per-joint position error (regression_loss.py:200)."""
    if target_weight is not None:
        w = jnp.asarray(target_weight)
        if w.ndim == pred.ndim - 1:
            w = w[..., None]
        pred, target = pred * w, target * w
    return jnp.mean(jnp.linalg.norm(pred - target, axis=-1)) * loss_weight


def bone_loss(pred, target, joint_parents, target_weight=None,
              loss_weight=1.0):
    """Bone-length consistency loss (regression_loss.py:306). target_weight
    here weights bones [N, K-?]."""
    # static child/parent index lists (self-parented roots excluded) so
    # shapes stay static under jit AND no norm is ever taken of the
    # structurally-zero root "bone" (sqrt(0) has a NaN gradient that 0*NaN
    # masking would propagate)
    parents = np.asarray(joint_parents)
    keep = np.arange(len(parents)) != parents
    child = np.arange(len(parents))[keep]
    par = parents[keep]
    bone_pred = jnp.linalg.norm(pred[:, child] - pred[:, par], axis=-1)
    bone_gt = jnp.linalg.norm(target[:, child] - target[:, par], axis=-1)
    if target_weight is not None:
        w = jnp.asarray(target_weight)
        bone_pred = bone_pred * w
        bone_gt = bone_gt * w
    # batch-mean each bone length FIRST, then L1 between the means
    d = jnp.abs(bone_pred.mean(axis=0) - bone_gt.mean(axis=0))
    return jnp.mean(d) * loss_weight


def bce_loss(pred, target, target_weight=None, loss_weight=1.0):
    """Binary cross-entropy on logistic outputs (classfication_loss.py:9
    uses F.binary_cross_entropy on probabilities)."""
    p = jnp.clip(pred, 1e-7, 1.0 - 1e-7)
    loss = -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))
    if target_weight is not None:
        w = jnp.asarray(target_weight)
        while w.ndim < loss.ndim:
            w = w[..., None]
        loss = loss * w
    return jnp.mean(loss) * loss_weight


def rle_loss(pred, sigma, target, target_weight=None,
             q_distribution='laplace', loss_weight=1.0):
    """Residual Log-likelihood Estimation loss (Li et al. ICCV'21) in the
    FLOW-FREE variant: -log Q(error) with a Laplace/Gaussian base density
    plus the log-sigma normalizer. The full RLE residual term requires a
    learned normalizing flow, which this (beyond-reference) utility does
    not model. `sigma` [N, K, D] are predicted scales."""
    sigma = jnp.maximum(sigma, 1e-9)
    error = (pred - target) / sigma
    log_sigma = jnp.log(sigma)
    if q_distribution == 'laplace':
        log_q = jnp.abs(error) + math.log(2.0)
    else:
        log_q = 0.5 * error ** 2 + 0.5 * math.log(2.0 * math.pi)
    loss = log_sigma + log_q
    if target_weight is not None:
        w = jnp.asarray(target_weight)
        if w.ndim == loss.ndim - 1:
            w = w[..., None]
        loss = loss * w
    return jnp.mean(loss) * loss_weight


# ---------------------------------------------------------------------------
# bottom-up (associative embedding) losses — multi_loss_factory.py
# ---------------------------------------------------------------------------

def ae_heatmap_loss(pred, gt, mask, supervise_empty=True, loss_weight=1.0):
    """Masked heatmap MSE for bottom-up (multi_loss_factory.py:30
    `HeatmapLoss`): per-sample mean over (K, H, W), then batch mean. When
    supervise_empty=False, empty GT channels are masked out."""
    loss = (pred - gt) ** 2 * mask[:, None].astype(pred.dtype)
    if not supervise_empty:
        empty = (jnp.max(gt, axis=(2, 3), keepdims=True) > 0)
        loss = loss * empty.astype(pred.dtype)
    return jnp.mean(loss, axis=(1, 2, 3)).mean() * loss_weight


def ae_tag_loss(tags, joints, loss_type='exp'):
    """Associative-embedding grouping loss (multi_loss_factory.py:70
    `AELoss.singleTagLoss`, vectorized over a padded person axis).

    Args:
      tags: [N, KHW, 1] flattened per-pixel tag map.
      joints: [N, M, K, 2] int array; [..., 0] = flat pixel index,
        [..., 1] = visibility (1/0). M = max persons (padded).

    Returns (push_loss, pull_loss), each [N] averaged like the reference
    (push normalized by M*(M-1), pull by M).
    """
    n, m, k, _ = joints.shape
    idx = joints[..., 0]                              # [N, M, K]
    vis = joints[..., 1].astype(tags.dtype)           # [N, M, K]
    tag_vals = jnp.take_along_axis(
        tags[..., 0], idx.reshape(n, -1), axis=1).reshape(n, m, k)
    cnt = jnp.sum(vis, axis=2)                        # [N, M]
    has = (cnt > 0).astype(tags.dtype)                # [N, M]
    mean_tag = jnp.sum(tag_vals * vis, axis=2) / jnp.maximum(cnt, 1.0)

    # pull: within-person variance
    pull_per = jnp.sum(((tag_vals - mean_tag[..., None]) ** 2) * vis,
                       axis=2) / jnp.maximum(cnt, 1.0)
    num_people = jnp.sum(has, axis=1)                 # [N]
    pull = jnp.sum(pull_per * has, axis=1) / jnp.maximum(num_people, 1.0)

    # push: between-person tag distances
    diff = mean_tag[:, :, None] - mean_tag[:, None, :]    # [N, M, M]
    pair_mask = has[:, :, None] * has[:, None, :]
    eye = jnp.eye(m, dtype=tags.dtype)
    pair_mask = pair_mask * (1.0 - eye)
    if loss_type == 'exp':
        push_mat = jnp.exp(-diff ** 2)
    else:                                             # 'max'
        push_mat = jnp.maximum(0.0, 1.0 - jnp.abs(diff))
    denom = jnp.maximum(num_people * (num_people - 1.0), 1.0)
    push = jnp.sum(push_mat * pair_mask, axis=(1, 2)) * 0.5 / denom
    push = jnp.where(num_people > 1, push, 0.0)
    pull = jnp.where(num_people > 0, pull, 0.0)
    return push, pull


# ---------------------------------------------------------------------------
# mesh / adversarial losses (reference mmpose/models/losses/mesh_loss.py)
# ---------------------------------------------------------------------------

def gan_loss(pred, target_is_real, gan_type='vanilla', loss_weight=1.0):
    """GAN objective used by the SMPL discriminator (reference
    mesh_loss.py `GANLoss`): 'vanilla' = BCE-with-logits, 'lsgan' = MSE,
    'wgan' = mean(+-pred)."""
    pred = jnp.asarray(pred)
    if gan_type == 'wgan':
        loss = -jnp.mean(pred) if target_is_real else jnp.mean(pred)
        return loss * loss_weight
    target = jnp.ones_like(pred) if target_is_real else jnp.zeros_like(pred)
    if gan_type == 'vanilla':
        loss = jnp.mean(jnp.maximum(pred, 0) - pred * target
                        + jnp.log1p(jnp.exp(-jnp.abs(pred))))
    elif gan_type == 'lsgan':
        loss = jnp.mean((pred - target) ** 2)
    else:
        raise ValueError(gan_type)
    return loss * loss_weight


def mesh_joint_loss(pred_joints_3d, gt_joints_3d, joints_3d_visible,
                    loss_weight=1.0, pelvis_ids=None):
    """L1 joint loss for mesh training (reference mesh_loss.py
    `MeshLoss.joints_3d_loss` / `joints_2d_loss`). With ``pelvis_ids``
    (the hip pair, reference (2, 3)) both poses are centered on the hip
    midpoint first — the 3D term must not be dominated by the global
    translation between the SMPL frame and the GT frame
    (mesh_loss.py:112-116); the 2D term passes None."""
    pred = jnp.asarray(pred_joints_3d)
    gt = jnp.asarray(gt_joints_3d)
    if pelvis_ids is not None:
        i, j = pelvis_ids
        pred = pred - (pred[:, i:i + 1] + pred[:, j:j + 1]) / 2
        gt = gt - (gt[:, i:i + 1] + gt[:, j:j + 1]) / 2
    conf = jnp.asarray(joints_3d_visible)[..., None]
    diff = jnp.abs(pred - gt) * conf
    return jnp.mean(diff) * loss_weight


def smpl_param_loss(pred_params, gt_params, has_smpl, loss_weight=1.0):
    """MSE over SMPL pose/shape parameters on samples with SMPL gt."""
    mask = jnp.asarray(has_smpl)[..., None]
    return jnp.mean(((pred_params - gt_params) ** 2) * mask) * loss_weight


def project_joints(x, intrinsics):
    """Project 3D camera-space joints to the 2D image plane
    (reference SemiSupervisionLoss.project_joints,
    regression_loss.py:395-424). x: [N, K, 3]; intrinsics: [N, 4]
    (f, c) or [N, 9] (f, c, k1 k2 k3, p1 p2) with radial/tangential
    distortion."""
    intr = jnp.asarray(intrinsics)
    while intr.ndim < x.ndim:
        intr = intr[:, None]
    f = intr[..., :2]
    c = intr[..., 2:4]
    # safe divide: an untrained trajectory head can put the root depth at
    # ~0; x/0 -> inf would leak NaN through the clip's zero cotangent
    # (0 * inf) even when the loss is warmup-gated to 0
    z = x[..., 2:]
    z = jnp.where(jnp.abs(z) < 1e-4, jnp.where(z < 0, -1e-4, 1e-4), z)
    _x = jnp.clip(x[..., :2] / z, -1.0, 1.0)
    if intr.shape[-1] == 9:
        k = intr[..., 4:7]
        p = intr[..., 7:9]
        r2 = jnp.sum(_x ** 2, axis=-1, keepdims=True)
        radial = 1 + jnp.sum(k * jnp.concatenate((r2, r2 ** 2, r2 ** 3),
                                                 axis=-1),
                             axis=-1, keepdims=True)
        tan = jnp.sum(p * _x, axis=-1, keepdims=True)
        _x = _x * (radial + tan) + p * r2
    return f * _x + c


def semi_supervision_loss(labeled_pose, unlabeled_pose, unlabeled_traj,
                          unlabeled_target_2d, intrinsics, joint_parents,
                          projection_loss_weight=1.0, bone_loss_weight=1.0,
                          warmup=None):
    """VideoPose3D semi-supervision loss on unlabeled data (reference
    SemiSupervisionLoss, regression_loss.py:360-449): MPJPE between the
    re-projected (pose + trajectory) and the 2D detections, plus
    bone-length consistency between unlabeled and labeled predictions.
    Functional warmup: pass ``warmup`` as a 0/1 scalar (e.g.
    ``iteration > warmup_iterations``) instead of the reference's stateful
    iteration counter; the gated branch is SKIPPED via lax.cond — the
    reference returns an empty loss dict during warmup, and merely
    multiplying by 0 would still propagate NaN (0 * inf) from degenerate
    inputs like an untrained trajectory head. Returns
    {'proj_loss', 'bone_loss'}."""
    def compute(ops):
        lab, unl_pose, unl_traj, tgt_2d, intr = ops
        unlabeled_output = unl_pose + unl_traj
        proj_2d = project_joints(unlabeled_output, intr)
        loss_proj = mpjpe_loss(proj_2d, tgt_2d,
                               loss_weight=projection_loss_weight)
        loss_bone = bone_loss(unl_pose, lab, joint_parents,
                              loss_weight=bone_loss_weight)
        return (jnp.asarray(loss_proj, jnp.float32),
                jnp.asarray(loss_bone, jnp.float32))

    ops = (labeled_pose, unlabeled_pose, unlabeled_traj,
           unlabeled_target_2d, intrinsics)
    if warmup is None:
        loss_proj, loss_bone = compute(ops)
    else:
        gate = jnp.asarray(warmup, jnp.float32)
        loss_proj, loss_bone = jax.lax.cond(
            gate > 0.5, compute,
            lambda _: (jnp.zeros((), jnp.float32),
                       jnp.zeros((), jnp.float32)), ops)
    return {'proj_loss': loss_proj, 'bone_loss': loss_bone}

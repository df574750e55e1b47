"""Keypoint losses, vectorized jnp (reference: mmpose/models/losses/).

The reference JointsMSELoss loops over joints and averages torch MSELoss
values (mse_loss.py:9-44); here it is a single masked reduction with
identical value and gradients.
"""
from __future__ import annotations

import jax.lax
import jax.numpy as jnp


def joints_mse_loss(pred, target, target_weight=None, loss_weight=1.0):
    """Weighted per-joint MSE over heatmaps.

    Args:
      pred, target: [N, K, H, W] (or [N, H, W, K] — see `channels_last`
        callers transpose first).
      target_weight: [N, K] visibility weights or None.

    Equals (1/K) * sum_k mean_{N,H,W}((w_nk * (pred - target))^2).
    """
    n, k, h, w = pred.shape
    diff = pred - target
    if target_weight is not None:
        diff = diff * target_weight[:, :, None, None]
    return jnp.mean(diff ** 2, axis=(0, 2, 3)).sum() / k * loss_weight


def combined_target_mse_loss(pred, target, target_weight, loss_weight=1.0):
    """UDP CombinedTarget loss: heatmap channel weighted by visibility, the
    two offset channels additionally gated by the GT response map
    (reference mse_loss.py:48 `CombinedTargetMSELoss`).

    pred/target: [N, 3K, H, W]; target_weight: [N, K].
    """
    n, c3, h, w = pred.shape
    k = c3 // 3
    p = pred.reshape(n, k, 3, h * w)
    t = target.reshape(n, k, 3, h * w)
    wgt = target_weight[:, :, None]
    hm_p, hm_t = p[:, :, 0] * wgt, t[:, :, 0] * wgt
    ox_p, oy_p = p[:, :, 1], p[:, :, 2]
    ox_t, oy_t = t[:, :, 1], t[:, :, 2]
    loss = 0.5 * jnp.mean((hm_p - hm_t) ** 2, axis=(0, 2))
    loss += 0.5 * jnp.mean((hm_t * ox_p - hm_t * ox_t) ** 2, axis=(0, 2))
    loss += 0.5 * jnp.mean((hm_t * oy_p - hm_t * oy_t) ** 2, axis=(0, 2))
    return loss.sum() / k * loss_weight


def joints_ohkm_mse_loss(pred, target, target_weight, topk=8, loss_weight=1.0):
    """Online hard keypoint mining MSE (reference mse_loss.py:97
    `JointsOHKMMSELoss`): per-sample keep the top-k joint losses."""
    n, k, h, w = pred.shape
    diff = (pred - target) * target_weight[:, :, None, None]
    per_joint = jnp.mean(diff ** 2, axis=(2, 3))           # [N, K]
    topk_vals, _ = jax.lax.top_k(per_joint, topk)
    return jnp.mean(jnp.sum(topk_vals, axis=1) / topk) * loss_weight


def adaptive_wing_loss(pred, target, target_weight=None, alpha=2.1,
                       omega=14.0, epsilon=1.0, theta=0.5, loss_weight=1.0):
    """Adaptive wing loss on heatmaps (reference heatmap_loss.py:9
    `AdaptiveWingLoss`; Wang et al. ICCV'19 face-alignment loss): log
    regime for small residuals with a target-dependent exponent
    ``alpha - y``, linear ``A·δ − C`` beyond ``theta``.

    Args:
      pred, target: [N, K, H, W]; target_weight [N, K] or [N, K, 1]
        multiplies pred/target before the criterion (the reference's
        ``use_target_weight`` path).
    """
    pred = jnp.asarray(pred, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    if target_weight is not None:
        w = jnp.asarray(target_weight).reshape(
            pred.shape[0], pred.shape[1], 1, 1)
        pred = pred * w
        target = target * w
    delta = jnp.abs(target - pred)
    ratio = theta / epsilon
    a = (omega * (1.0 / (1.0 + ratio ** (alpha - target)))
         * (alpha - target) * ratio ** (alpha - target - 1.0) / epsilon)
    c = theta * a - omega * jnp.log1p(ratio ** (alpha - target))
    small = omega * jnp.log1p((delta / epsilon) ** (alpha - target))
    return jnp.mean(jnp.where(delta < theta, small,
                              a * delta - c)) * loss_weight

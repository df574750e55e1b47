"""Optimizer: AdamW with ViT layer-wise LR decay, as one optax chain.

Re-implements the reference's param-group construction
(mmcv_custom/layer_decay_optimizer_constructor.py:18
`LayerDecayOptimizerConstructor`) as per-leaf multipliers:

  * layer id: pos_embed / patch_embed -> 0; blocks_i -> i+1;
    everything else (last_norm, heads) -> depth+1.
  * lr scale = layer_decay_rate ** (depth + 1 - layer_id).
  * no weight decay for 1-D params, biases, pos_embed.

The reference's LR schedule (mmcv `lr_config` step policy with linear
warmup, ViTPose_base_coco_256x192.py:33-38) becomes an optax schedule:
linear warmup from ratio*base over `warmup_iters`, then x0.1 at the given
epoch boundaries.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import optax


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    base_lr: float = 5e-4
    weight_decay: float = 0.1
    layer_decay_rate: float = 0.75
    num_layers: int = 12                   # transformer depth
    betas: tuple = (0.9, 0.999)
    warmup_iters: int = 500
    warmup_ratio: float = 1e-3
    decay_epochs: Sequence[int] = (170, 200)
    decay_factor: float = 0.1
    total_epochs: int = 210
    grad_clip_norm: float = 1.0


def layer_id_for_path(path, depth):
    """Map a flax param path (tuple of str keys) to a ViT layer id."""
    keys = [getattr(p, 'key', str(p)) for p in path]
    joined = '.'.join(keys)
    if 'pos_embed' in joined or 'cls_token' in joined \
            or 'mask_token' in joined:
        return 0
    if 'patch_embed' in joined:
        return 0
    for k in keys:
        if k.startswith('blocks_'):
            return int(k.split('_')[1]) + 1
    return depth + 1


def _lr_scale_tree(params, depth, rate):
    num_layers = depth + 2
    return jax.tree_util.tree_map_with_path(
        lambda path, _: rate ** (num_layers - 1 -
                                 layer_id_for_path(path, depth)),
        params)


def _wd_mask_tree(params):
    def mask(path, leaf):
        keys = [getattr(p, 'key', str(p)) for p in path]
        joined = '.'.join(keys)
        if leaf.ndim <= 1 or keys[-1] == 'bias' or 'pos_embed' in joined:
            return False
        return True
    return jax.tree_util.tree_map_with_path(mask, params)


def make_lr_schedule(cfg: OptimConfig, steps_per_epoch: int,
                     policy: str = 'step'):
    """Linear warmup -> main policy. 'step' = piecewise-constant decay at
    `decay_epochs` (reference lr_config step policy); 'cosine' = cosine
    anneal to 0 over total_epochs (reference mmcv_custom/checkpoint.py:292
    `cosine_scheduler`)."""
    import jax.numpy as jnp
    if policy == 'cosine':
        total = cfg.total_epochs * steps_per_epoch

        def main_fn(count):
            # anneal over the POST-warmup span (reference cosine_scheduler,
            # mmcv_custom/checkpoint.py:292, starts its cosine at frac=0
            # after the warmup iters) so the curve is continuous at the
            # warmup boundary
            frac = jnp.clip((count - cfg.warmup_iters)
                            / max(total - cfg.warmup_iters, 1), 0.0, 1.0)
            return cfg.base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
    else:
        boundaries = {e * steps_per_epoch: cfg.decay_factor
                      for e in cfg.decay_epochs}
        main_fn = optax.piecewise_constant_schedule(cfg.base_lr, boundaries)

    def schedule(count):
        warm = cfg.base_lr * (
            cfg.warmup_ratio + (1.0 - cfg.warmup_ratio)
            * jnp.minimum(count, cfg.warmup_iters) / cfg.warmup_iters)
        return jnp.where(count < cfg.warmup_iters, warm, main_fn(count))

    return schedule


def layer_decay_adamw(params, cfg: OptimConfig, steps_per_epoch: int = 1000,
                      schedule=None):
    """Build the optax chain. `params` is only used for tree structure."""
    if schedule is None:
        schedule = make_lr_schedule(cfg, steps_per_epoch)
    scales = _lr_scale_tree(params, cfg.num_layers, cfg.layer_decay_rate)
    wd_mask = _wd_mask_tree(params)
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1]),
        optax.add_decayed_weights(cfg.weight_decay, mask=wd_mask),
        optax.scale_by_learning_rate(schedule),
        # per-group lr multiplier applies to BOTH the adam step and the
        # decayed weights, exactly like torch param-group lr
        _scale_by_tree(scales),
    )


def _scale_by_tree(scales):
    # path-keyed lookup (default 1.0) rather than a structural tree.map:
    # wrappers like optax.masked / multi_transform (freeze_tx) prune the
    # update tree, and a captured full-params scale tree would then fail
    # to match structurally
    flat, _ = jax.tree_util.tree_flatten_with_path(scales)
    table = {jax.tree_util.keystr(p): s for p, s in flat}

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        def scale(path, u):
            return u * table.get(jax.tree_util.keystr(path), 1.0)
        return jax.tree_util.tree_map_with_path(scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def weight_norm_clip(params, max_norm=1.0, key_names=('kernel',)):
    """Clip matched parameter tensors to a maximum L2 norm.

    Functional counterpart of the reference WeightNormClipHook
    (core/utils/regularizations.py:56), which rescales each conv weight to
    ``max_norm`` before every forward; applied after each optimizer update
    it enforces the same invariant at every training forward (used by the
    VideoPose3D-style TCN/TemporalRegressionHead with max_norm=1).
    """
    import jax.numpy as jnp

    def clip(path, leaf):
        last = getattr(path[-1], 'key', str(path[-1]))
        if last in key_names and getattr(leaf, 'ndim', 0) >= 2:
            n = jnp.linalg.norm(leaf)
            scale = jnp.where(n > max_norm, max_norm / (n + 1e-6), 1.0)
            return leaf * scale
        return leaf

    return jax.tree_util.tree_map_with_path(clip, params)


def make_freeze_mask(params, frozen_stages=-1, freeze_attn=False,
                     freeze_ffn=False):
    """Trainability mask for the ViT backbone's freezing options
    (reference vit.py:249 `_freeze_stages`): True = trainable.

    frozen_stages >= 0 freezes patch_embed and blocks 1..frozen_stages
    (the reference quirk of starting at block 1 is preserved);
    freeze_attn freezes every block's attn+norm1; freeze_ffn freezes
    pos_embed, patch_embed, and every block's mlp+norm2. Use with
    ``optax.masked(tx, mask)``.
    """
    import re

    def trainable(path, leaf):
        keys = [getattr(p, 'key', str(p)) for p in path]
        joined = '/'.join(keys)
        if frozen_stages >= 0:
            if 'patch_embed' in keys:
                return False
            m = re.search(r'blocks_(\d+)', joined)
            if m and 1 <= int(m.group(1)) <= frozen_stages:
                return False
        if freeze_attn and ('attn' in keys or 'norm1' in keys):
            return False
        if freeze_ffn:
            if 'pos_embed' in keys or 'patch_embed' in keys:
                return False
            if 'mlp' in keys or 'norm2' in keys:
                return False
        return True

    return jax.tree_util.tree_map_with_path(trainable, params)


def freeze_tx(tx, trainable_mask):
    """Wrap an optax transform so updates are ZEROED where the mask is
    False (optax.masked alone passes unmasked updates through unchanged)."""
    labels = jax.tree.map(lambda t: 'train' if t else 'freeze',
                          trainable_mask)
    return optax.multi_transform(
        {'train': tx, 'freeze': optax.set_to_zero()}, labels)

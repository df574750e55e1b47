"""Generic multi-task model: one backbone, many heads.

Counterpart of the reference `MultiTask` detector
(mmpose/models/detectors/multi_task.py): a shared backbone feeds a list of
heads (e.g. heatmap + regression, or per-dataset heads); training losses are
computed per head and summed. The ViTPose+ per-dataset variant lives in
TopDownModel(num_extra_heads=...); this class composes arbitrary modules.
"""
from __future__ import annotations

from typing import Any, Callable, List, Sequence

import flax.linen as nn
import jax.numpy as jnp


class MultiTaskModel(nn.Module):
    backbone: nn.Module
    heads: Sequence[nn.Module]
    # ViT-style backbones take `deterministic`; CNNs take `train`
    backbone_mode_kwarg: str = 'train'

    @nn.compact
    def __call__(self, x, train: bool = False, **backbone_kw):
        if self.backbone_mode_kwarg == 'deterministic':
            backbone_kw['deterministic'] = not train
        else:
            backbone_kw['train'] = train
        feat = self.backbone(x, **backbone_kw)
        return [h(feat, train=train) for h in self.heads]


def multitask_loss(outputs: List[jnp.ndarray], targets: List[jnp.ndarray],
                   target_weights: List[jnp.ndarray],
                   loss_fns: List[Callable], loss_weights=None):
    """Sum of per-head losses (reference multi_task.py get_loss)."""
    total = 0.0
    losses = {}
    for i, (out, tgt, w, fn) in enumerate(zip(outputs, targets,
                                              target_weights, loss_fns)):
        li = fn(out, tgt, w)
        if loss_weights is not None:
            li = li * loss_weights[i]
        losses[f'loss_head_{i}'] = li
        total = total + li
    losses['total_loss'] = total
    return total, losses

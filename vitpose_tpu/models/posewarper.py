"""PoseWarper: video top-down pose with temporal feature alignment.

Counterpart of the reference `PoseWarper` detector
(mmpose/models/detectors/posewarper.py, 244 LoC): a shared backbone encodes
the key frame and supporting frames; the PoseWarperNeck (deformable
alignment, models/necks.py) aggregates supports onto the key frame; a
heatmap head decodes. Inference averages aligned features across frames.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class PoseWarper(nn.Module):
    """backbone/neck/head composition over [N, T, H, W, 3] frame windows
    (frame index T//2 is the key frame)."""
    backbone: nn.Module
    neck: nn.Module
    head: nn.Module
    backbone_mode_kwarg: str = 'train'

    @nn.compact
    def __call__(self, frames, train: bool = False):
        n, t, h, w, c = frames.shape
        kw = ({'deterministic': not train}
              if self.backbone_mode_kwarg == 'deterministic'
              else {'train': train})
        # one batched backbone pass over all frames
        feats = self.backbone(frames.reshape(n * t, h, w, c), **kw)
        fh, fw, fc = feats.shape[1:]
        feats = feats.reshape(n, t, fh, fw, fc)
        key = feats[:, t // 2]
        agg = self.neck(key, feats, train=train)
        out = self.head(agg, train=train)
        return out.transpose(0, 3, 1, 2)

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
    def __call__(self, frames, train: bool = False, frame_weight=None,
                 key_index=None):
        # frame_weight: optional [T] per-frame aggregation weights
        # forwarded to the neck (reference posewarper.py:120-132 reads
        # img_metas frame_weight). key_index: static index of the key
        # frame in the window — 0 for PoseTrackVideoDataset windows (key
        # frame first), default T//2 for symmetric windows.
        n, t, h, w, c = frames.shape
        kw = ({'deterministic': not train}
              if self.backbone_mode_kwarg == 'deterministic'
              else {'train': train})
        # one batched backbone pass over all frames
        feats = self.backbone(frames.reshape(n * t, h, w, c), **kw)
        fh, fw, fc = feats.shape[1:]
        feats = feats.reshape(n, t, fh, fw, fc)
        key = feats[:, t // 2 if key_index is None else int(key_index)]
        agg = self.neck(key, feats, train=train,
                        frame_weight=frame_weight)
        out = self.head(agg, train=train)
        return out.transpose(0, 3, 1, 2)


def build_posewarper(mcfg: dict):
    """Config dict -> PoseWarper (reference posewarper.py detector):
    backbone + PoseWarperNeck + heatmap head."""
    from ..train.loop import build_backbone
    from ..models.necks import PoseWarperNeck
    from ..models.heads import HeatmapHead
    mcfg = dict(mcfg)
    bb = build_backbone(mcfg.pop('backbone_type', 'hrnet'),
                        **(mcfg.pop('backbone_overrides', None) or {}))
    neck_kw = dict(mcfg.pop('neck', None) or {})
    # optimizer-level knob consumed by train_posewarper_model, not the
    # module (reference freeze_trans_layer, posewarper_neck.py:95)
    neck_kw.pop('freeze_trans_layer', None)
    head_kw = dict(mcfg.pop('head_overrides', None) or {})
    head_kw.setdefault('deconv_filters', ())
    head_kw.setdefault('deconv_kernels', ())
    # reference stage-2 head is a parameter-less identity: 0 deconvs +
    # final_conv_kernel=0 (hrnet_w48_..._posewarper_stage2.py:87-88) — the
    # neck already emits the 17 heatmap channels, and genuine reference
    # .pth checkpoints carry NO keypoint_head tensors. Overrides that add
    # deconvs get the usual 1x1 prediction conv unless they say otherwise.
    head_kw.setdefault('final_kernel',
                       0 if not head_kw['deconv_filters'] else 1)
    out_channels = mcfg.pop('out_channels', 17)
    return PoseWarper(
        backbone=bb,
        neck=PoseWarperNeck(**neck_kw),
        head=HeatmapHead(out_channels, **head_kw))

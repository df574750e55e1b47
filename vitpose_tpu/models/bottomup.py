"""Bottom-up (associative embedding) pose estimation.

Counterpart of the reference `AssociativeEmbedding` detector
(mmpose/models/detectors/associative_embedding.py:28) and its aggregation
utilities (mmpose/core/evaluation/bottom_up_eval.py). TPU-first shape:

  * one jitted function produces (aggregated heatmaps, stacked tag maps)
    including the flip pass — averaging and tag concatenation happen on
    device;
  * `HeatmapParser` (ops/group.py) then groups on host;
  * `get_group_preds` maps grouped poses back to image space with the same
    center/scale affine as top-down.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .vit import ViT
from .heads_extra import AEHead
from ..ops.geometry import transform_preds
from ..ops.group import HeatmapParser


def ae_forward_with_flip(apply_fn, variables, imgs, num_joints, flip_index,
                         align_corners=False, with_flip=True):
    """Run an AE model on imgs and the horizontal flip; average heatmaps and
    stack tags along L (reference aggregate_stage_flip semantics for the
    single-stage case, bottom_up_eval.py:165).

    apply_fn(variables, imgs) -> [N, H, W, K(+K)] NHWC output.
    Returns (heatmaps [N, K, H, W], tags [N, K, H, W, L]).
    """
    out = apply_fn(variables, imgs)
    k = num_joints
    hm = out[..., :k].transpose(0, 3, 1, 2)
    tag = out[..., k:].transpose(0, 3, 1, 2)
    if not with_flip:
        return hm, tag[..., None]
    out_f = apply_fn(variables, imgs[:, :, ::-1, :])
    hm_f = out_f[..., :k].transpose(0, 3, 1, 2)
    tag_f = out_f[..., k:].transpose(0, 3, 1, 2)
    fi = jnp.asarray(flip_index)
    hm_f = hm_f[:, fi][..., ::-1]
    tag_f = tag_f[:, fi][..., ::-1]
    heatmaps = (hm + hm_f) * 0.5
    tags = jnp.stack([tag, tag_f], axis=-1)          # L=2
    return heatmaps, tags


def get_group_preds(grouped_joints, center, scale, heatmap_size,
                    use_udp=False):
    """Grouped poses (heatmap coords) -> image coords (reference
    bottom_up_eval.py:293). grouped_joints: [P, K, 3+L] numpy."""
    if len(grouped_joints) == 0:
        return []
    joints = np.asarray(grouped_joints, np.float32)
    coords = joints[..., :2]
    out = np.asarray(transform_preds(
        coords.reshape(-1, 2),
        np.asarray(center, np.float32), np.asarray(scale, np.float32),
        heatmap_size, use_udp=use_udp))
    joints = joints.copy()
    joints[..., :2] = out.reshape(coords.shape)
    return [joints[i] for i in range(joints.shape[0])]


class BottomUpEstimator:
    """Backbone + AE head + parser, bundled for inference."""

    def __init__(self, backbone_cfg, num_joints=17, tag_per_joint=True,
                 parser_cfg=None, dataset_info=None):
        from .vit import ViTConfig
        self.backbone = ViT(backbone_cfg if isinstance(backbone_cfg,
                                                       ViTConfig)
                            else ViTConfig(**backbone_cfg))
        self.head = AEHead(num_joints, tag_per_joint=tag_per_joint,
                           deconv_filters=(256,), deconv_kernels=(4,))
        self.num_joints = num_joints
        self.parser = HeatmapParser(num_joints=num_joints,
                                    **(parser_cfg or {}))
        self.dataset_info = dataset_info
        self._jit = None

    def init(self, rng, sample):
        bb_vars = self.backbone.init(rng, sample)
        feat = self.backbone.apply(bb_vars, sample)
        head_vars = self.head.init(rng, feat)
        return {'backbone': bb_vars, 'head': head_vars}

    def apply(self, variables, imgs, train=False):
        feat = self.backbone.apply(variables['backbone'], imgs,
                                   deterministic=not train)
        return self.head.apply(variables['head'], feat, train=train)

    def infer(self, variables, imgs, flip_index, with_flip=True):
        if self._jit is None:
            self._jit = jax.jit(
                lambda v, x: ae_forward_with_flip(
                    lambda vv, xx: self.apply(vv, xx), v, x,
                    self.num_joints, flip_index, with_flip=with_flip))
        return self._jit(variables, imgs)

    def parse(self, heatmaps, tags, center, scale, adjust=True, refine=True,
              use_udp=False):
        results, scores = self.parser.parse(heatmaps, tags, adjust=adjust,
                                            refine=refine)
        h, w = np.asarray(heatmaps).shape[-2:]
        preds = get_group_preds(results[0], center, scale, (w, h),
                                use_udp=use_udp)
        return preds, scores

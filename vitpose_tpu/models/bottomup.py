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


def reduce_multires_output(outs, num_joints, with_ae=None):
    """Multi-resolution AE head outputs (NHWC list, e.g.
    AEHigherResolutionHead) -> ONE [N, H, W, K+tagK] map at the highest
    resolution: heatmaps bilinearly upsampled and averaged across outputs,
    tags taken from the first tag-bearing output (reference HigherHRNet
    single-scale aggregation: with_heatmaps=[True, True],
    with_ae=[True, False])."""
    outs = list(outs)
    k = num_joints
    if with_ae is None or not isinstance(with_ae, (list, tuple)):
        with_ae = [o.shape[-1] > k for o in outs]
    target = max(outs, key=lambda o: o.shape[1] * o.shape[2])
    n, th, tw = target.shape[0], target.shape[1], target.shape[2]

    def up(x):
        if x.shape[1:3] == (th, tw):
            return x
        return jax.image.resize(x, (n, th, tw, x.shape[-1]),
                                method='bilinear')

    hm = sum(up(o[..., :k]) for o in outs) / len(outs)
    tag = None
    for o, wa in zip(outs, with_ae):
        if wa and o.shape[-1] > k:
            tag = up(o[..., k:])
            break
    return hm if tag is None else jnp.concatenate([hm, tag], axis=-1)


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
    if tag_f.shape[1] == k:
        tag_f = tag_f[:, fi][..., ::-1]
    else:
        # tag_per_joint=False: a single shared tag map — no channel
        # permutation (reference flip_feature_maps with flip_index=None)
        tag_f = tag_f[..., ::-1]
    heatmaps = (hm + hm_f) * 0.5
    tags = jnp.stack([tag, tag_f], axis=-1)          # L=2
    return heatmaps, tags


def get_group_preds(grouped_joints, center, scale, heatmap_size,
                    use_udp=False):
    """Grouped poses (heatmap coords) -> image coords (reference
    bottom_up_eval.py:293). grouped_joints: [P, K, 3+L] numpy.

    In UDP mode `scale` comes from resize_align_multi_scale(use_udp=True)
    and is the ORIGINAL image span in pixels (size-1 units), not the
    pixel_std=200 crop convention: the reference warps heatmap coords
    with get_warp_matrix(0, hm-1, scale, hm-1), which for theta=0 and
    size_input == size_target reduces to a pure rescale.
    """
    if len(grouped_joints) == 0:
        return []
    joints = np.asarray(grouped_joints, np.float32)
    coords = joints[..., :2]
    if use_udp:
        factor = (np.asarray(scale, np.float32)
                  / (np.asarray(heatmap_size, np.float32) - 1.0))
        out = coords.reshape(-1, 2) * factor
    else:
        out = np.asarray(transform_preds(
            coords.reshape(-1, 2),
            np.asarray(center, np.float32), np.asarray(scale, np.float32),
            heatmap_size))
    joints = joints.copy()
    joints[..., :2] = out.reshape(coords.shape)
    return [joints[i] for i in range(joints.shape[0])]


class BottomUpEstimator:
    """Backbone + AE head + parser, bundled for inference."""

    def __init__(self, backbone_cfg, num_joints=17, tag_per_joint=True,
                 parser_cfg=None, dataset_info=None, head=None):
        import flax.linen as nn
        from .vit import ViTConfig
        if isinstance(backbone_cfg, nn.Module):
            # any NHWC feature backbone (HRNet etc. — fully-convolutional
            # ones support the multi-scale test protocol, which feeds
            # variable input sizes)
            self.backbone = backbone_cfg
        else:
            self.backbone = ViT(backbone_cfg
                                if isinstance(backbone_cfg, ViTConfig)
                                else ViTConfig(**backbone_cfg))
        self.head = head or AEHead(num_joints, tag_per_joint=tag_per_joint,
                                   deconv_filters=(256,),
                                   deconv_kernels=(4,))
        # multi-stage AE heads (Hourglass-AE style) consume the backbone's
        # FULL per-stack output list; test protocol selects the last stage
        # (reference hourglass_ae_coco_512x512.py select_output_index=[3])
        from .heads_extra import AEMultiStageHead
        self._multi_stage = isinstance(self.head, AEMultiStageHead)
        self.num_joints = num_joints
        self.parser = HeatmapParser(num_joints=num_joints,
                                    **(parser_cfg or {}))
        self.dataset_info = dataset_info
        self._jit = None

    def init(self, rng, sample):
        bb_vars = self.backbone.init(rng, sample)
        feat = self.backbone.apply(bb_vars, sample)
        if isinstance(feat, (list, tuple)) and not self._multi_stage:
            feat = feat[0]
        head_vars = self.head.init(rng, feat)
        return {'backbone': bb_vars, 'head': head_vars}

    def apply(self, variables, imgs, train=False, mutable=False):
        """Forward. With ``mutable=True`` (training with BN backbones/
        heads) returns (out, new_batch_stats) where new_batch_stats is a
        {'backbone': ..., 'head': ...} tree of updated running stats."""
        new_stats = {}
        if isinstance(self.backbone, ViT):
            feat = self.backbone.apply(variables['backbone'], imgs,
                                       deterministic=not train)
            new_stats['backbone'] = variables['backbone'].get(
                'batch_stats', {})
        else:
            if mutable and train and 'batch_stats' in variables['backbone']:
                feat, st = self.backbone.apply(
                    variables['backbone'], imgs, train=True,
                    mutable=['batch_stats'])
                new_stats['backbone'] = st['batch_stats']
            else:
                # no BN running stats to track (e.g. LayerNorm backbone)
                feat = self.backbone.apply(variables['backbone'], imgs,
                                           train=train)
                new_stats['backbone'] = variables['backbone'].get(
                    'batch_stats', {})
            if isinstance(feat, (list, tuple)) and not self._multi_stage:
                feat = feat[0]
        if mutable and train and 'batch_stats' in variables['head']:
            out, st = self.head.apply(variables['head'], feat, train=True,
                                      mutable=['batch_stats'])
            new_stats['head'] = st['batch_stats']
        elif mutable:
            out = self.head.apply(variables['head'], feat, train=train)
            new_stats['head'] = variables['head'].get('batch_stats', {})
        else:
            out = self.head.apply(variables['head'], feat, train=train)
        if self._multi_stage:
            # AEMultiStageHead emits NCHW per stage; normalize to the
            # estimator-wide NHWC convention so the training loss,
            # multi-scale inference and infer all see one layout
            out = [o.transpose(0, 2, 3, 1) for o in out]
        if mutable:
            return out, new_stats
        return out

    def infer(self, variables, imgs, flip_index, with_flip=True):
        # cache the jitted closure PER (flip_index, with_flip) — both are
        # baked into the trace, so reusing the first call's closure for a
        # different dataset's flip permutation would silently un-flip
        # with the wrong channel order
        key = (tuple(int(i) for i in np.asarray(flip_index).tolist()),
               bool(with_flip))
        if self._jit is None:
            self._jit = {}
        if key not in self._jit:
            def apply_reduced(vv, xx):
                out = self.apply(vv, xx)
                if isinstance(out, (list, tuple)):
                    if self._multi_stage:
                        # reference select_output_index=[last]
                        out = out[-1]
                    else:
                        out = reduce_multires_output(
                            out, self.num_joints,
                            getattr(self.head, 'with_ae_loss', None))
                return out
            self._jit[key] = jax.jit(
                lambda v, x: ae_forward_with_flip(
                    apply_reduced, v, x,
                    self.num_joints, flip_index, with_flip=with_flip))
        return self._jit[key](variables, imgs)

    def parse(self, heatmaps, tags, center, scale, adjust=True, refine=True,
              use_udp=False):
        results, scores = self.parser.parse(heatmaps, tags, adjust=adjust,
                                            refine=refine)
        h, w = np.asarray(heatmaps).shape[-2:]
        preds = get_group_preds(results[0], center, scale, (w, h),
                                use_udp=use_udp)
        return preds, scores


# ---------------------------------------------------------------------------
# multi-stage / multi-scale aggregation (reference bottom_up_eval.py)
# ---------------------------------------------------------------------------

def split_ae_outputs(outputs, num_joints, with_heatmaps, with_ae,
                     select_output_index):
    """NCHW outputs -> (heatmap list, tag list)
    (reference bottom_up_eval.py:9)."""
    heatmaps, tags = [], []
    for i, out in enumerate(outputs):
        if i not in select_output_index:
            continue
        if with_heatmaps[i]:
            heatmaps.append(out[:, :num_joints])
        if with_ae[i]:
            off = num_joints if with_heatmaps[i] else 0
            tags.append(out[:, off:])
    return heatmaps, tags


def flip_feature_maps(feature_maps, flip_index=None):
    """Horizontal flip (+ channel swap) of NCHW maps
    (reference bottom_up_eval.py:46)."""
    out = []
    for fm in feature_maps:
        fm = fm[..., ::-1]
        if flip_index is not None:
            fm = fm[:, jnp.asarray(flip_index)]
        out.append(fm)
    return out


def _resize_nchw(fm, size_hw, align_corners):
    if fm.shape[2:] == tuple(size_hw):
        return fm
    if align_corners:
        from .multistage_nets import resize_bilinear_ac
        x = fm.transpose(0, 2, 3, 1)
        x = resize_bilinear_ac(x, size_hw)
        return x.transpose(0, 3, 1, 2)
    return jax.image.resize(
        fm, fm.shape[:2] + tuple(size_hw), method='bilinear')


def _resize_list(feature_maps, align_corners, index=-1, resize_size=None):
    if resize_size is None:
        resize_size = feature_maps[index].shape[2:]
    return [_resize_nchw(fm, resize_size, align_corners)
            for fm in feature_maps]


def aggregate_stage_flip(feature_maps, feature_maps_flip, index=-1,
                         project2image=True, size_projected=None,
                         align_corners=False, aggregate_stage='concat',
                         aggregate_flip='average'):
    """reference bottom_up_eval.py:165 — resize multi-stage maps to a base
    size, then average/concat the original and flipped passes."""
    if feature_maps_flip is None:
        aggregate_flip = 'none'
    size = ((size_projected[1], size_projected[0])
            if project2image and size_projected else None)

    def agg(maps):
        if maps is None:
            return None
        resized = _resize_list(maps, align_corners, index=index,
                               resize_size=size)
        if aggregate_stage == 'average':
            s = resized[0]
            for r in resized[1:]:
                s = s + r
            return [s / len(resized)]
        return resized                     # 'concat'

    origin = agg(feature_maps)
    flipped = agg(feature_maps_flip)
    if aggregate_flip == 'average':
        return [(o + f) / 2.0 for o, f in zip(origin, flipped)]
    if aggregate_flip == 'concat':
        return list(origin) + list(flipped)
    return list(origin)


def aggregate_scale(feature_maps_list, align_corners=False,
                    aggregate_scale_mode='average'):
    """reference bottom_up_eval.py:254 — combine per-scale maps at the
    first scale's size: 'average' heatmaps or 'unsqueeze_concat' tags."""
    resized = _resize_list(feature_maps_list, align_corners, index=0)
    if aggregate_scale_mode == 'average':
        s = resized[0]
        for r in resized[1:]:
            s = s + r
        return s / len(resized)
    return jnp.stack(resized, axis=-1)     # [N, K, H, W, L]

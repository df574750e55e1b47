"""Interacting-hand 3D estimator: backbone + Interhand3DHead + decode.

Counterpart of the reference `Interhand3D` detector
(mmpose/models/detectors/interhand_3d.py): predicts 2.5D hand heatmaps,
relative root depth, and hand type; decode maps the 2.5D volume to pixel
coords + millimetre depths using the dataset's depth conventions.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .vit import ViT, ViTConfig
from .heads_extra import Interhand3DHead
from ..ops.decode import heatmaps3d_to_coords
from ..ops.geometry import transform_preds

R_WRIST, L_WRIST = 20, 41


class Interhand3DEstimator:
    def __init__(self, backbone_cfg=None, num_joints=42, depth_size=64,
                 heatmap_size=(64, 64), depth_range_mm=400.0,
                 root_depth_range_mm=400.0, backbone=None,
                 backbone_mode_kwarg='deterministic',
                 split_hands=False, deconv_filters=(256, 256)):
        """backbone_cfg builds the default ViT trunk; pass `backbone` (any
        NHWC feature module, e.g. ResNet-50 as in the reference
        res50_interhand3d_all_256x256.py config) with
        backbone_mode_kwarg='train' for CNN trunks."""
        if backbone is not None:
            self.backbone = backbone
        else:
            if backbone_cfg is None:
                raise ValueError('pass backbone_cfg (ViTConfig/dict) or '
                                 'backbone (an NHWC feature module)')
            self.backbone = ViT(backbone_cfg
                                if isinstance(backbone_cfg, ViTConfig)
                                else ViTConfig(**backbone_cfg))
            backbone_mode_kwarg = 'deterministic'
        self.backbone_mode_kwarg = backbone_mode_kwarg
        self.head = Interhand3DHead(num_joints=num_joints,
                                    depth_size=depth_size,
                                    split_hands=split_hands,
                                    deconv_filters=tuple(deconv_filters))
        self.num_joints = num_joints
        self.depth_size = depth_size
        self.heatmap_size = heatmap_size
        self.depth_range = depth_range_mm
        self.root_depth_range = root_depth_range_mm
        self._jit = None

    def _bb_kwargs(self, train):
        if self.backbone_mode_kwarg == 'deterministic':
            return {'deterministic': not train}
        return {'train': train}

    def init(self, rng, sample):
        bb_vars = self.backbone.init(rng, sample, **self._bb_kwargs(False))
        feat = self.backbone.apply(bb_vars, sample,
                                   **self._bb_kwargs(False))
        head_vars = self.head.init(rng, feat, train=False)
        return {'backbone': bb_vars, 'head': head_vars}

    def apply(self, variables, imgs, train=False):
        """Forward pass. With train=True, BatchNorm statistic updates are
        computed and DISCARDED (the right behavior inside a jax.grad loss
        closure); use `train_apply` to advance them."""
        if train:
            out, _ = self.train_apply(variables, imgs)
            return out
        feat = self.backbone.apply(variables['backbone'], imgs,
                                   **self._bb_kwargs(False))
        return self.head.apply(variables['head'], feat, train=False)

    def train_apply(self, variables, imgs):
        """Training-mode forward that also returns variables with advanced
        BatchNorm statistics (the CNN trunk of the reference
        res50_interhand3d config, and the head's deconv BNs)."""
        def _run(mod, mod_vars, *args, **kw):
            if 'batch_stats' in mod_vars:
                out, upd = mod.apply(mod_vars, *args,
                                     mutable=['batch_stats'], **kw)
                return out, {**mod_vars, **upd}
            return mod.apply(mod_vars, *args, **kw), mod_vars

        feat, new_bb = _run(self.backbone, variables['backbone'], imgs,
                            **self._bb_kwargs(True))
        out, new_head = _run(self.head, variables['head'], feat,
                             train=True)
        return out, {'backbone': new_bb, 'head': new_head}

    def infer(self, variables, imgs):
        if self._jit is None:
            self._jit = jax.jit(lambda v, x: self.apply(v, x, train=False))
        return self._jit(variables, imgs)

    def decode(self, hm3d, root_depth_logits, hand_type_logits, center,
               scale):
        """2.5D volume -> keypoints.

        Returns dict(keypoints_3d [N, K, 3] (image-x, image-y, depth mm),
        rel_root_depth [N] mm, hand_type [N, 2] probabilities).
        """
        coords, maxvals = heatmaps3d_to_coords(jnp.asarray(hm3d))
        w = hm3d.shape[4]
        h = hm3d.shape[3]
        xy = transform_preds(coords[..., :2], jnp.asarray(center),
                             jnp.asarray(scale), (w, h))
        # depth bins -> mm in [-range/2, range/2]
        z = (coords[..., 2] / self.depth_size - 0.5) * self.depth_range
        kp = jnp.concatenate([xy, z[..., None]], axis=-1)

        # continuous soft-argmax over the 1D depth bins (reference
        # Heatmap1DHead.soft_argmax_1d, interhand_3d_head.py:209 — also
        # what the training loss supervises); hard argmax would quantize
        # rel_root_depth to range/bins (6.25 mm) steps
        root_bins = root_depth_logits.shape[-1]
        probs = jax.nn.softmax(root_depth_logits, axis=-1)
        root_coord = jnp.sum(
            probs * jnp.arange(root_bins, dtype=probs.dtype), axis=-1)
        rel_root = (root_coord / root_bins - 0.5) * self.root_depth_range
        hand_type = jax.nn.sigmoid(hand_type_logits)
        return dict(keypoints_3d=np.asarray(kp),
                    scores=np.asarray(maxvals),
                    rel_root_depth=np.asarray(rel_root),
                    hand_type=np.asarray(hand_type))


def interhand3d_losses(outputs, target_hm3d, hm_weight, rel_root_depth,
                       root_weight, hand_type, type_weight,
                       root_depth_bins=64, root_depth_range_mm=400.0):
    """Training losses for the three sub-heads (reference
    interhand_3d_head.py:333 `Interhand3DHead.get_loss`).

    Args:
      outputs: (heatmaps3d [N, K, D, H, W], root_logits [N, B],
        hand_type_logits [N, 2]) from `Interhand3DEstimator.apply`.
      target_hm3d: [N, K, D, H, W] from
        `ops.target.generate_3d_heatmaps`; hm_weight [N, K] or [N, K, 1].
      rel_root_depth: [N] target right-to-left root depth in mm;
        root_weight [N] (0 when a hand is missing).
      hand_type: [N, 2] left/right presence; type_weight [N] or [N, 2].

    Returns dict(hand_loss, rel_root_loss, hand_type_loss) — MSE on the
    gaussian volumes, L1 on the soft-argmax root-depth value (in bin
    units, the reference Heatmap1DHead convention), and BCE on the
    hand-type probabilities.
    """
    from .losses import joints_mse_loss
    from .losses_regression import l1_loss, bce_loss

    hm3d, root_logits, type_logits = outputs
    n, k, d, h, w = hm3d.shape
    hm_weight = jnp.asarray(hm_weight).reshape(n, k)
    hand_loss = joints_mse_loss(hm3d.reshape(n, k, d * h, w),
                                jnp.asarray(target_hm3d).reshape(
                                    n, k, d * h, w), hm_weight)

    bins = root_logits.shape[-1]
    soft = jax.nn.softmax(root_logits, axis=-1)
    pred_bins = jnp.sum(soft * jnp.arange(bins, dtype=jnp.float32), axis=-1)
    target_bins = (jnp.asarray(rel_root_depth) / root_depth_range_mm
                   + 0.5) * root_depth_bins
    # targets outside the bin range carry no gradient (reference
    # hand_transform.py:41 HandGenerateRelDepthTarget weight window)
    in_range = ((target_bins >= 0)
                & (target_bins <= root_depth_bins)).astype(jnp.float32)
    rel_root_loss = l1_loss(pred_bins, target_bins,
                            jnp.asarray(root_weight) * in_range)

    type_prob = jax.nn.sigmoid(type_logits)
    hand_type_loss = bce_loss(type_prob, jnp.asarray(hand_type),
                              jnp.asarray(type_weight))
    return dict(hand_loss=hand_loss, rel_root_loss=rel_root_loss,
                hand_type_loss=hand_type_loss)


def backproject_to_camera(keypoints_3d, focal, princpt, abs_depth):
    """Pixel-space decode output -> camera-space millimetres.

    keypoints_3d [N, K, 3]: (pixel x, pixel y, root-relative depth mm);
    abs_depth [N, 2]: absolute root depths (right, left wrist) in mm.
    Returns [N, K, 3] root-relative camera coords comparable to
    InterHandDataset.evaluate's ground truth.
    """
    kp = np.asarray(keypoints_3d, np.float64).copy()
    focal = np.asarray(focal, np.float64).reshape(-1, 2)
    princpt = np.asarray(princpt, np.float64).reshape(-1, 2)
    abs_depth = np.asarray(abs_depth, np.float64).reshape(-1, 2)
    out = np.zeros_like(kp)
    for i in range(kp.shape[0]):
        z_abs = kp[i, :, 2].copy()
        z_abs[:21] += abs_depth[i % len(abs_depth), 0]
        z_abs[21:] += abs_depth[i % len(abs_depth), 1]
        f = focal[i % len(focal)]
        c = princpt[i % len(princpt)]
        x = (kp[i, :, 0] - c[0]) / f[0] * z_abs
        y = (kp[i, :, 1] - c[1]) / f[1] * z_abs
        cam = np.stack([x, y, z_abs], axis=1)
        cam[:21] -= cam[R_WRIST]
        cam[21:] -= cam[L_WRIST]
        out[i] = cam
    return out

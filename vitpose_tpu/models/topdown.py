"""Top-down pose estimator: backbone + head as one functional pipeline.

Re-design of the reference `TopDown` detector
(mmpose/models/detectors/top_down.py:24) and `TopDownMoE`
(top_down_moe.py:27). Instead of a stateful nn.Module with
`forward(return_loss=...)` dispatch, the estimator exposes pure functions:

  * ``forward(variables, imgs, ...) -> heatmaps``              (train or eval)
  * ``infer(variables, imgs, flip_index, ...) -> heatmaps``    flip-test
    composed INSIDE the jit: second forward on jnp.flip'ed images, channel
    un-permutation, averaging — no device->host sync (the reference moves
    heatmaps to numpy between the two passes, top_down.py:163-188).
  * ``loss(...)`` masked MSE dict like `TopDown.forward_train`.

Heatmaps are returned NCHW ([N, K, H, W]) at the API boundary to match the
reference's numpy conventions; internally everything is NHWC.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .vit import ViT, ViTConfig, VIT_VARIANTS
from .heads import HeatmapHead, SimpleHead
from .losses import joints_mse_loss, combined_target_mse_loss


@dataclasses.dataclass(frozen=True)
class TopDownConfig:
    backbone: ViTConfig = ViTConfig()
    head_type: str = 'heatmap'    # 'heatmap' | 'simple' | 'regression' | ...
    out_channels: int = 17
    deconv_filters: tuple = (256, 256)
    deconv_kernels: tuple = (4, 4)
    # ViPNAS grouped-deconv head: groups per deconv layer; () keeps the
    # ViPNASHead defaults (144ch/16g — the vipnas_res50 recipe; mbv3 uses
    # 160ch/160g, reference vipnas_mbv3_coco_256x192.py:39-40)
    deconv_groups: tuple = ()
    final_kernel: int = 1
    # channel-preserving Conv+BN+ReLU layers before the prediction conv
    # (HRNetV2 heads; reference extra num_conv_layers/num_conv_kernels)
    head_extra_convs: tuple = ()
    upsample: int = 4
    # test-time behavior (reference test_cfg)
    flip_test: bool = True
    shift_heatmap: bool = False
    post_process: str = 'default'
    modulate_kernel: int = 11
    use_udp: bool = True
    target_type: str = 'GaussianHeatmap'
    # regression (DeepPose) criterion: 'smooth_l1' | 'wing' | 'soft_wing'
    reg_loss: str = 'smooth_l1'
    # heatmap criterion: 'mse' | 'awing' (reference res50_..._awing.py)
    heatmap_loss: str = 'mse'
    # ViTPose+ multi-head (associate heads for extra datasets)
    num_extra_heads: int = 0
    extra_head_channels: tuple = ()
    # multi-stage backbones (CPM/Hourglass/MSPN/RSN): stage/unit counts for
    # the multi-stage heads; use_prm appends RSN's Pose Refine Machine
    num_stages: int = 1
    num_units: int = 4
    use_prm: bool = False


def make_config(variant='b', img_size=(256, 192), head='heatmap',
                out_channels=17, num_experts=0, part_dim=0,
                dtype='float32', remat=False, remat_policy='full',
                **test_cfg):
    v = VIT_VARIANTS[variant]
    bb = ViTConfig(img_size=img_size, num_experts=num_experts,
                   part_dim=part_dim, dtype=dtype, remat_blocks=remat,
                   remat_policy=remat_policy, **v)
    return TopDownConfig(backbone=bb, head_type=head,
                         out_channels=out_channels, **test_cfg)


class TopDownModel(nn.Module):
    """flax composition of backbone + head(s)."""
    cfg: TopDownConfig

    def setup(self):
        self.backbone = ViT(self.cfg.backbone, name='backbone')
        if self.cfg.head_type == 'heatmap':
            self.head = HeatmapHead(
                self.cfg.out_channels, self.cfg.deconv_filters,
                self.cfg.deconv_kernels, self.cfg.final_kernel,
                dtype=jnp.dtype(self.cfg.backbone.dtype), name='head')
        elif self.cfg.head_type == 'simple':
            self.head = SimpleHead(
                self.cfg.out_channels, self.cfg.upsample,
                dtype=jnp.dtype(self.cfg.backbone.dtype), name='head')
        else:
            raise ValueError(self.cfg.head_type)
        extra = []
        for i in range(self.cfg.num_extra_heads):
            ch = self.cfg.extra_head_channels[i]
            extra.append(HeatmapHead(
                ch, self.cfg.deconv_filters, self.cfg.deconv_kernels,
                self.cfg.final_kernel,
                dtype=jnp.dtype(self.cfg.backbone.dtype),
                name=f'extra_head_{i}'))
        self.extra_heads = extra

    def __call__(self, imgs, train: bool = False, expert_idx=None,
                 head_idx: Optional[int] = None, all_heads: bool = False):
        """imgs [N, H, W, 3] -> heatmaps [N, K, Hh, Wh] (NCHW outside).

        all_heads=True returns a list over [main, *extra] heads — used for
        ViTPose+ multi-dataset training where every head runs on the full
        batch and losses are masked by dataset id (reference
        top_down_moe.py:166-203).
        """
        feat = self.backbone(imgs, deterministic=not train,
                             expert_idx=expert_idx)
        if all_heads:
            outs = [self.head(feat, train=train)]
            for h in self.extra_heads:
                outs.append(h(feat, train=train))
            return [o.transpose(0, 3, 1, 2).astype(jnp.float32) for o in outs]
        if head_idx is None or head_idx == 0:
            out = self.head(feat, train=train)
        else:
            out = self.extra_heads[head_idx - 1](feat, train=train)
        return out.transpose(0, 3, 1, 2).astype(jnp.float32)


class GenericTopDown(nn.Module):
    """TopDown estimator over an arbitrary NHWC feature backbone (HRNet,
    LiteHRNet, HRFormer, ResNe(X)t, SCNet, ViPNAS, ...).

    Mirrors TopDownModel's interface (cfg flags, NCHW float32 heatmaps, the
    same `infer` flip-test helper works on it) so run_validation / train
    steps are backbone-agnostic; `expert_idx` is accepted and ignored.
    head='heatmap' is the SimpleBaseline deconv head; HRNet-family configs
    use empty deconv_filters for the bare 1x1 prediction conv; 'vipnas'
    selects the grouped-deconv ViPNAS head.
    """
    backbone: nn.Module
    cfg: 'TopDownConfig'

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.backbone.dtype)
        if c.head_type == 'vipnas':
            from .heads_extra import ViPNASHead
            kw = {}
            if c.deconv_groups:
                kw = dict(deconv_filters=c.deconv_filters,
                          deconv_groups=c.deconv_groups)
            self.head = ViPNASHead(c.out_channels, dtype=dtype, name='head',
                                   **kw)
        elif c.head_type == 'regression':
            # DeepPose: GAP neck + fc -> [N, K, 2] normalized coordinates
            # (reference deeppose_regression_head.py:13 + gap_neck.py)
            from .heads_extra import RegressionHead
            self.head = RegressionHead(c.out_channels, dtype=dtype,
                                       name='head')
        else:
            self.head = HeatmapHead(
                c.out_channels, c.deconv_filters, c.deconv_kernels,
                c.final_kernel, extra_conv_kernels=c.head_extra_convs,
                dtype=dtype, name='head')

    def __call__(self, imgs, train: bool = False, expert_idx=None,
                 head_idx=None, all_heads: bool = False):
        feat = self.backbone(imgs, train=train)
        if isinstance(feat, (list, tuple)):
            feat = feat[0]
        out = self.head(feat, train=train)
        if self.cfg.head_type == 'regression':
            out = out.astype(jnp.float32)           # [N, K, 2] coords
        else:
            out = out.transpose(0, 3, 1, 2).astype(jnp.float32)
        return [out] if all_heads else out


class GenericMultiStageTopDown(nn.Module):
    """TopDown estimator over a multi-stage backbone (CPM, stacked
    Hourglass, MSPN/RSN) with per-stage supervision.

    Counterpart of the reference pairings TopDown + TopdownHeatmapMultiStage
    / MSMU heads (topdown_heatmap_multi_stage_head.py:17,
    configs/.../cpm_coco_368x368.py, hourglass52_coco_256x256.py,
    mspn50_coco_256x192.py). In train mode it returns the full LIST of
    stage (or stage-unit) heatmaps so every stage is supervised (the
    reference sums criterion over stages, multi_stage_head.py get_loss);
    in eval mode only the final stage's prediction is returned, so the
    shared `infer` flip-test helper applies unchanged.
    """
    backbone: nn.Module
    cfg: 'TopDownConfig'

    def setup(self):
        from .heads_extra import MultiStageHead, MSMUHead
        c = self.cfg
        dtype = jnp.dtype(c.backbone.dtype)
        if c.head_type == 'msmu':
            ih, iw = c.backbone.img_size
            self.head = MSMUHead(c.out_channels, num_stages=c.num_stages,
                                 num_units=c.num_units,
                                 out_shape=(ih // 4, iw // 4),
                                 use_prm=c.use_prm, dtype=dtype,
                                 name='head')
        elif c.head_type == 'identity':
            # backbone already emits per-stage prediction maps (CPM)
            self.head = None
        else:
            self.head = MultiStageHead(
                c.out_channels, num_stages=c.num_stages,
                deconv_filters=c.deconv_filters,
                deconv_kernels=c.deconv_kernels,
                final_kernel=c.final_kernel, dtype=dtype, name='head')

    def __call__(self, imgs, train: bool = False, expert_idx=None,
                 head_idx=None, all_heads: bool = False):
        feats = self.backbone(imgs, train=train)
        if self.head is None:
            # CPM emits per-stage NCHW heatmaps directly (classic_cnns.py)
            outs = list(feats)
        else:
            outs = self.head(feats, train=train)
        outs = [o.astype(jnp.float32) for o in outs]
        if train or all_heads:
            return outs
        return outs[-1]


# ---------------------------------------------------------------------------
# pure-function API
# ---------------------------------------------------------------------------

def forward(model: TopDownModel, variables, imgs, train=False,
            expert_idx=None, rngs=None, mutable=False, **kw):
    if train:
        return model.apply(variables, imgs, train=True,
                           expert_idx=expert_idx, rngs=rngs,
                           mutable=['batch_stats'] if mutable else False, **kw)
    return model.apply(variables, imgs, train=False, expert_idx=expert_idx,
                       **kw)


def infer(model: TopDownModel, variables, imgs, flip_index=None,
          expert_idx=None, head_idx=None):
    """Eval forward with optional flip-test, fully on device.

    Parity with reference TopDown.forward_test (top_down.py:163-188): the
    averaged heatmap is (hm + flip_back(hm_flipped)) / 2, with the optional
    1px `shift_heatmap` right-shift of the flipped map.
    """
    cfg = model.cfg
    hm = model.apply(variables, imgs, train=False, expert_idx=expert_idx,
                     head_idx=head_idx)
    if flip_index is None or not cfg.flip_test:
        return hm
    hm_f = model.apply(variables, imgs[:, :, ::-1, :], train=False,
                       expert_idx=expert_idx, head_idx=head_idx)
    if cfg.head_type == 'regression':
        # fliplr_regression with the deeppose default static center 0.5
        # (normalized coords; reference deeppose_regression_head.py:110)
        hm_f = hm_f[:, jnp.asarray(flip_index)]
        hm_f = hm_f.at[..., 0].set(1.0 - hm_f[..., 0])
        return (hm + hm_f) * 0.5
    from ..ops.geometry import flip_back
    hm_f = flip_back(hm_f, jnp.asarray(flip_index),
                     target_type=cfg.target_type)
    if cfg.shift_heatmap:
        hm_f = hm_f.at[..., 1:].set(hm_f[..., :-1])
    return (hm + hm_f) * 0.5


def loss_fn(heatmaps, target, target_weight, target_type='GaussianHeatmap'):
    """Keypoint loss dict (reference TopdownHeatmapSimpleHead.get_loss)."""
    if target_type.lower() == 'combinedtarget':
        return {'heatmap_loss': combined_target_mse_loss(
            heatmaps, target, target_weight)}
    return {'heatmap_loss': joints_mse_loss(heatmaps, target, target_weight)}

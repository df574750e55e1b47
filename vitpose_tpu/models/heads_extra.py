"""Additional heads: coordinate regression, bottom-up AE, multi-stage.

Counterparts of the reference head zoo (mmpose/models/heads/):
  * RegressionHead  — `DeepposeRegressionHead` (deeppose_regression_head.py):
    GAP -> Linear -> [N, K, 2] normalized coords.
  * DeconvHead / AEHead — `DeconvHead` and `AESimpleHead`
    (deconv_head.py, ae_simple_head.py): deconv stack + final conv whose
    channels include associative-embedding tag maps
    (out = K * (1 + tag_per_joint)).
  * MultiStageHead — `TopdownHeatmapMultiStageHead`
    (topdown_heatmap_multi_stage_head.py): one deconv+conv head per stage
    over a list of stage features; losses averaged over stages.
All NHWC flax modules mirroring heads.py conventions.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .heads import HeatmapHead


class RegressionHead(nn.Module):
    """GAP + fc -> normalized (0..1) keypoint coordinates [N, K, 2]."""
    num_joints: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.mean(x, axis=(1, 2))                  # NHWC -> NC
        out = nn.Dense(self.num_joints * 2, dtype=self.dtype,
                       name='fc')(x)
        return out.reshape(-1, self.num_joints, 2)


class DeconvHead(HeatmapHead):
    """Reference `DeconvHead` is structurally the classic decoder with
    arbitrary output channels and a 3-deconv default — reuse HeatmapHead."""
    deconv_filters: Sequence[int] = (256, 256, 256)
    deconv_kernels: Sequence[int] = (4, 4, 4)


class AEHead(nn.Module):
    """Associative-embedding head: K heatmaps + K (or 1) tag maps
    (reference ae_simple_head.py `AESimpleHead`)."""
    num_joints: int
    tag_per_joint: bool = True
    with_ae_loss: bool = True
    deconv_filters: Sequence[int] = ()
    deconv_kernels: Sequence[int] = ()
    final_kernel: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim_tag = self.num_joints if self.tag_per_joint else 1
        out_ch = self.num_joints + (dim_tag if self.with_ae_loss else 0)
        return DeconvHead(out_ch, self.deconv_filters, self.deconv_kernels,
                          self.final_kernel, dtype=self.dtype,
                          name='deconv_head')(x, train=train)

    def split(self, out):
        """[N, H, W, K(+Kt)] NHWC -> (heatmaps [N,K,H,W], tags [N,K,H,W,L])"""
        k = self.num_joints
        hm = out[..., :k].transpose(0, 3, 1, 2)
        tags = out[..., k:].transpose(0, 3, 1, 2)[..., None] \
            if out.shape[-1] > k else None
        return hm, tags


class MultiStageHead(nn.Module):
    """One heatmap head per stage over a list of stage feature maps
    (reference topdown_heatmap_multi_stage_head.py:17). Returns a list of
    [N, K, H, W] heatmaps; train losses average over stages."""
    out_channels: int
    num_stages: int = 1
    deconv_filters: Sequence[int] = (256, 256, 256)
    deconv_kernels: Sequence[int] = (4, 4, 4)
    final_kernel: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        if not isinstance(xs, (list, tuple)):
            xs = [xs]
        assert len(xs) == self.num_stages
        outs = []
        for i, x in enumerate(xs):
            out = HeatmapHead(self.out_channels, self.deconv_filters,
                              self.deconv_kernels, self.final_kernel,
                              dtype=self.dtype, name=f'stage_{i}')(
                                  x, train=train)
            outs.append(out.transpose(0, 3, 1, 2))
        return outs


class PRM(nn.Module):
    """Pose Refine Machine (reference topdown_heatmap_multi_stage_head.py
    `PRM`, from RSN ECCV'20): a 3x3 ConvModule, then an output-channel
    attention (GAP -> Linear+BN1d+ReLU x2 -> Sigmoid) and a spatial
    attention (1x1 ConvModule -> depthwise-separable k9 ConvModule ->
    Sigmoid), combined as out1 * (1 + channel * spatial)."""
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype, name=name)

        k = self.out_channels
        out1 = nn.Conv(k, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                       dtype=self.dtype, name='prm1_conv')(x)
        out1 = nn.relu(bn('prm1_bn')(out1))

        # channel attention (middle path)
        m = jnp.mean(out1, axis=(1, 2))
        m = nn.Dense(k, dtype=self.dtype, name='mid_fc1')(m)
        m = nn.relu(bn('mid_bn1')(m))
        m = nn.Dense(k, dtype=self.dtype, name='mid_fc2')(m)
        m = nn.relu(bn('mid_bn2')(m))
        m = jax.nn.sigmoid(m)[:, None, None, :]

        # spatial attention (bottom path)
        b = nn.Conv(k, (1, 1), use_bias=False, dtype=self.dtype,
                    name='bot_conv')(out1)
        b = nn.relu(bn('bot_bn')(b))
        b = nn.Conv(k, (9, 9), padding=((4, 4), (4, 4)),
                    feature_group_count=k, use_bias=False,
                    dtype=self.dtype, name='bot_dw_conv')(b)
        b = nn.relu(bn('bot_dw_bn')(b))
        b = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                    name='bot_pw_conv')(b)
        b = nn.relu(bn('bot_pw_bn')(b))
        b = jax.nn.sigmoid(b)

        return out1 * (1.0 + m * b)


class MSMUHead(nn.Module):
    """Multi-Stage Multi-Unit head for MSPN/RSN
    (reference topdown_heatmap_multi_stage_head.py `TopdownHeatmapMSMUHead`
    with its `PredictHeatmap` submodule): per (stage, scale-unit), a 1x1
    ConvModule (channel-preserving, BN+ReLU) then a 3x3 ConvModule to K
    channels (BN, no activation), bilinearly resized WITH align_corners to
    `out_shape`. All units are supervised; the last stage's output is the
    inference prediction. ``use_prm`` appends the Pose Refine Machine to
    every unit (an option of the reference head — RSN paper recipe; note
    no config in the mirrored reference zoo enables it)."""
    out_channels: int
    num_stages: int = 2
    num_units: int = 4
    out_shape: Optional[tuple] = None   # (h, w); None = highest unit res
    use_prm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, stage_feats, train: bool = False):
        from .multistage_nets import resize_bilinear_ac
        out_shape = self.out_shape or stage_feats[0][-1].shape[1:3]
        outs = []
        for si, feats in enumerate(stage_feats):
            assert len(feats) == self.num_units
            for ui, f in enumerate(feats):
                nm = f's{si}_u{ui}'
                x = nn.Conv(f.shape[-1], (1, 1), use_bias=False,
                            dtype=self.dtype, name=f'{nm}_conv1')(f)
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype, name=f'{nm}_bn1')(x)
                x = nn.relu(x)
                x = nn.Conv(self.out_channels, (3, 3),
                            padding=((1, 1), (1, 1)), use_bias=False,
                            dtype=self.dtype, name=f'{nm}_conv2')(x)
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype, name=f'{nm}_bn2')(x)
                x = resize_bilinear_ac(x, tuple(out_shape))
                if self.use_prm:
                    x = PRM(self.out_channels, dtype=self.dtype,
                            name=f'{nm}_prm')(x, train=train)
                outs.append(x.transpose(0, 3, 1, 2))
        return outs


class ViPNASHead(nn.Module):
    """ViPNAS heatmap head (reference vipnas_heatmap_simple_head.py): deconv
    layers use grouped convolutions found by NAS."""
    out_channels: int
    deconv_filters: Sequence[int] = (144, 144, 144)
    deconv_groups: Sequence[int] = (16, 16, 16)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (f, g) in enumerate(zip(self.deconv_filters,
                                       self.deconv_groups)):
            # grouped transposed conv (flax ConvTranspose has no groups):
            # split channels, deconv each group, concat
            groups = jnp.split(x, g, axis=-1) if g > 1 else [x]
            outs = [nn.ConvTranspose(f // g, (4, 4), strides=(2, 2),
                                     padding='SAME', use_bias=False,
                                     transpose_kernel=True,
                                     dtype=self.dtype,
                                     name=f'deconv_{i}_{gi}')(part)
                    for gi, part in enumerate(groups)]
            x = outs[0] if len(outs) == 1 else jnp.concatenate(outs,
                                                               axis=-1)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f'bn_{i}')(x)
            x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name='final')(x)
        return x


class Interhand3DHead(nn.Module):
    """Interacting-hand 3D head (reference interhand_3d_head.py, 521 LoC):
    three parallel sub-heads on the backbone feature —
      * 2.5D heatmaps [K, D, H', W'] via deconvs + 1x1 producing K*D
        channels,
      * root-relative depth: GAP -> MLP -> 1D heatmap over depth bins,
      * hand-type (left/right presence): GAP -> MLP -> 2 logits.
    """
    num_joints: int = 42
    depth_size: int = 64
    root_depth_bins: int = 64
    deconv_filters: Sequence[int] = (256, 256)
    # reference layout (interhand_3d_head.py:312-313): SEPARATE right/left
    # Heatmap3DHead deconv stacks (21 joints each, right first) instead of
    # one fused 42-joint stack — required for .pth conversion parity
    split_hands: bool = False
    dtype: jnp.dtype = jnp.float32

    def _branch(self, x, prefix, num_joints, train):
        y = x
        for i, f in enumerate(self.deconv_filters):
            y = nn.ConvTranspose(f, (4, 4), strides=(2, 2), padding='SAME',
                                 use_bias=False, transpose_kernel=True,
                                 dtype=self.dtype,
                                 name=f'{prefix}deconv_{i}')(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f'{prefix}bn_{i}')(y)
            y = nn.relu(y)
        return nn.Conv(num_joints * self.depth_size, (1, 1),
                       dtype=self.dtype,
                       name=f'{prefix}final' if prefix else 'hm3d')(y)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.split_hands:
            assert self.num_joints % 2 == 0
            half = self.num_joints // 2
            hm = jnp.concatenate(
                [self._branch(x, 'right_', half, train),
                 self._branch(x, 'left_', half, train)], axis=-1)
        else:
            hm = self._branch(x, '', self.num_joints, train)
        n, hh, ww, _ = hm.shape
        heatmaps3d = hm.transpose(0, 3, 1, 2).reshape(
            n, self.num_joints, self.depth_size, hh, ww)

        pooled = jnp.mean(x, axis=(1, 2))
        root = nn.Dense(512, dtype=self.dtype, name='root_fc1')(pooled)
        root = nn.relu(root)
        root_depth = nn.Dense(self.root_depth_bins, dtype=self.dtype,
                              name='root_fc2')(root)
        ht = nn.relu(nn.Dense(512, dtype=self.dtype,
                              name='type_fc1')(pooled))
        hand_type = nn.Dense(2, dtype=self.dtype, name='type_fc2')(ht)
        return heatmaps3d, root_depth, hand_type


class AEHigherResolutionHead(nn.Module):
    """HigherHRNet associative-embedding head (reference
    ae_higher_resolution_head.py:13): a final conv on the input features
    plus deconv stages — each optionally concatenating the previous
    prediction — of [deconv+BN+ReLU, num_basic_blocks BasicBlocks], every
    stage emitting its own prediction map. Returns a list of NHWC maps at
    increasing resolution."""
    num_joints: int
    tag_per_joint: bool = True
    num_deconv_layers: int = 1
    deconv_filters: Sequence[int] = (32,)
    deconv_kernels: Sequence[int] = (4,)
    num_basic_blocks: int = 4
    cat_output: Sequence[bool] = (True,)
    with_ae_loss: Sequence[bool] = (True, False)
    final_kernel: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .resnet import BasicBlock, _bn
        k = self.num_joints
        dim_tag = k if self.tag_per_joint else 1
        pad = (self.final_kernel - 1) // 2

        def final(idx, feat):
            ch = k + dim_tag if self.with_ae_loss[idx] else k
            return nn.Conv(ch, (self.final_kernel,) * 2,
                           padding=((pad, pad), (pad, pad)),
                           dtype=self.dtype, name=f'final_{idx}')(feat)

        outs = [final(0, x)]
        for i in range(self.num_deconv_layers):
            inp = (jnp.concatenate([x, outs[-1]], axis=-1)
                   if self.cat_output[i] else x)
            y = nn.ConvTranspose(self.deconv_filters[i],
                                 (self.deconv_kernels[i],) * 2,
                                 strides=(2, 2), padding='SAME',
                                 use_bias=False, transpose_kernel=True,
                                 dtype=self.dtype, name=f'deconv_{i}')(inp)
            y = _bn(train, self.dtype, f'deconv_{i}_bn')(y)
            y = nn.relu(y)
            for b in range(self.num_basic_blocks):
                y = BasicBlock(self.deconv_filters[i], dtype=self.dtype,
                               name=f'deconv_{i}_blk{b}')(y, train=train)
            x = y
            outs.append(final(i + 1, x))
        return outs


class AEMultiStageHead(nn.Module):
    """Associative-embedding multi-stage head (reference
    ae_multi_stage_head.py:12): one deconv stack + prediction conv per
    stage over a list of stage features (Hourglass-AE style training).
    final_kernel=0 means an identity final layer (the backbone already
    emits prediction maps)."""
    out_channels: int
    num_stages: int = 1
    num_deconv_layers: int = 3
    deconv_filters: Sequence[int] = (256, 256, 256)
    deconv_kernels: Sequence[int] = (4, 4, 4)
    final_kernel: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        assert isinstance(feats, (list, tuple)) and \
            len(feats) == self.num_stages
        outs = []
        for si, x in enumerate(feats):
            for i in range(self.num_deconv_layers):
                x = nn.ConvTranspose(
                    self.deconv_filters[i], (self.deconv_kernels[i],) * 2,
                    strides=(2, 2), padding='SAME', use_bias=False,
                    transpose_kernel=True, dtype=self.dtype,
                    name=f's{si}_deconv_{i}')(x)
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype, name=f's{si}_bn_{i}')(x)
                x = nn.relu(x)
            if self.final_kernel > 0:
                pad = (self.final_kernel - 1) // 2
                x = nn.Conv(self.out_channels, (self.final_kernel,) * 2,
                            padding=((pad, pad), (pad, pad)),
                            dtype=self.dtype, name=f's{si}_final')(x)
            outs.append(x.transpose(0, 3, 1, 2).astype(jnp.float32))
        return outs

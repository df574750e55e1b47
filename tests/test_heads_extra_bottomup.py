"""Tests: extra heads, bottom-up estimator end-to-end on synthetic scenes."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitpose_tpu.models.heads_extra import (RegressionHead, AEHead,
                                            MultiStageHead)
from vitpose_tpu.models.bottomup import BottomUpEstimator, get_group_preds
from vitpose_tpu.models.vit import ViTConfig


def test_regression_head_shapes():
    head = RegressionHead(num_joints=17)
    x = jnp.ones((2, 8, 6, 32))
    v = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(v, x)
    assert out.shape == (2, 17, 2)


def test_ae_head_split():
    head = AEHead(num_joints=5, tag_per_joint=True, deconv_filters=(16,),
                  deconv_kernels=(4,))
    x = jnp.ones((2, 8, 6, 32))
    v = head.init(jax.random.PRNGKey(0), x, train=False)
    out = head.apply(v, x, train=False)
    assert out.shape == (2, 16, 12, 10)
    hm, tags = head.split(np.asarray(out))
    assert hm.shape == (2, 5, 16, 12)
    assert tags.shape == (2, 5, 16, 12, 1)


def test_multi_stage_head():
    head = MultiStageHead(out_channels=5, num_stages=2,
                          deconv_filters=(16,), deconv_kernels=(4,))
    xs = [jnp.ones((2, 8, 6, 32)), jnp.ones((2, 8, 6, 32))]
    v = head.init(jax.random.PRNGKey(0), xs, train=False)
    outs = head.apply(v, xs, train=False)
    assert len(outs) == 2 and outs[0].shape == (2, 5, 16, 12)


def test_bottomup_end_to_end():
    bb = ViTConfig(img_size=(64, 48), embed_dim=32, depth=2, num_heads=4)
    est = BottomUpEstimator(bb, num_joints=17)
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.normal(rng, (1, 64, 48, 3))
    variables = est.init(rng, imgs)
    flip_index = np.arange(17)
    hm, tags = est.infer(variables, imgs, flip_index)
    assert hm.shape[0:2] == (1, 17)
    assert tags.shape[-1] == 2              # flip stacked
    center = np.array([32.0, 24.0])
    scale = np.array([0.3, 0.4])
    preds, scores = est.parse(np.asarray(hm, np.float32),
                              np.asarray(tags, np.float32), center, scale)
    assert isinstance(preds, list)


def test_get_group_preds_transform():
    poses = np.zeros((2, 17, 4), np.float32)
    poses[..., :2] = 10.0
    poses[..., 2] = 0.9
    out = get_group_preds(poses, np.array([100.0, 100.0]),
                          np.array([1.0, 1.0]), (48, 64))
    assert len(out) == 2
    # heatmap coord 10 -> image coords via the top-down affine convention
    assert np.isfinite(out[0]).all()


def test_hourglass_ae_bottomup_end_to_end():
    """Hourglass-AE bottom-up (reference hourglass_ae_coco_512x512.py):
    backbone emits per-stack 2K-channel prediction maps, identity
    multi-stage head, inference selects the LAST stage, then flip-average
    + grouping produce poses."""
    from vitpose_tpu.models.lightweight import HourglassAE
    from vitpose_tpu.models.heads_extra import AEMultiStageHead

    k = 5
    bb = HourglassAE(downsample_times=2, num_stacks=2, out_channels=2 * k,
                     stage_channels=(16, 24, 32), feat_channels=16)
    head = AEMultiStageHead(out_channels=2 * k, num_stages=2,
                            num_deconv_layers=0, deconv_filters=(),
                            deconv_kernels=(), final_kernel=0)
    est = BottomUpEstimator(bb, num_joints=k, head=head)
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.normal(rng, (1, 64, 64, 3))
    variables = est.init(rng, imgs)
    hm, tags = est.infer(variables, imgs, np.arange(k))
    assert hm.shape == (1, k, 16, 16)
    assert tags.shape == (1, k, 16, 16, 2)
    preds, scores = est.parse(np.asarray(hm, np.float32),
                              np.asarray(tags, np.float32),
                              np.array([32.0, 32.0]), np.array([0.3, 0.3]))
    assert isinstance(preds, list)


def test_hourglass_ae_config_builds():
    import os
    from vitpose_tpu.utils.config import load_config
    from vitpose_tpu.train.loop import build_model_from_cfg
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(
        repo, 'vitpose_tpu/configs/coco/hourglass_ae_coco_512x512.py'))
    est = build_model_from_cfg(dict(cfg['model']))
    assert est._multi_stage and est.num_joints == 17


def test_infer_cache_keys_on_flip_index():
    """BottomUpEstimator.infer must not reuse a jitted closure traced for
    a DIFFERENT flip_index / with_flip (both are baked into the trace)."""
    import jax
    import jax.numpy as jnp
    from vitpose_tpu.models.bottomup import BottomUpEstimator
    from vitpose_tpu.models.hrnet import HRNet, HRNetConfig
    from vitpose_tpu.models.heads_extra import AEHead
    from vitpose_tpu.data import DatasetInfo

    bb = HRNet(HRNetConfig(width=8, stage_modules=(1, 1, 1),
                           stage_blocks=1))
    est = BottomUpEstimator(bb, num_joints=17,
                            head=AEHead(17, deconv_filters=(),
                                        deconv_kernels=()),
                            dataset_info=DatasetInfo.load('coco'))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                    jnp.float32)
    variables = est.init(jax.random.PRNGKey(0), x)
    fi_a = np.arange(17)
    fi_b = np.arange(17)[::-1].copy()
    hm_a, _ = est.infer(variables, x, fi_a)
    hm_b, _ = est.infer(variables, x, fi_b)
    assert not np.allclose(np.asarray(hm_a), np.asarray(hm_b))
    hm_nf, tag_nf = est.infer(variables, x, fi_a, with_flip=False)
    assert tag_nf.shape[-1] == 1                 # L=1: flip really off


def test_tag_per_joint_false_flip_infer():
    """tag_per_joint=False (single shared tag map): flip-test inference
    must not apply the K-length channel permutation to the 1-channel tag
    block (reference flip_feature_maps gets flip_index=None there)."""
    import jax
    import jax.numpy as jnp
    from vitpose_tpu.models.bottomup import BottomUpEstimator
    from vitpose_tpu.models.hrnet import HRNet, HRNetConfig
    from vitpose_tpu.models.heads_extra import AEHead
    from vitpose_tpu.data import DatasetInfo

    info = DatasetInfo.load('coco')
    bb = HRNet(HRNetConfig(width=8, stage_modules=(1, 1, 1),
                           stage_blocks=1))
    est = BottomUpEstimator(bb, num_joints=17, tag_per_joint=False,
                            head=AEHead(17, tag_per_joint=False,
                                        deconv_filters=(),
                                        deconv_kernels=()),
                            dataset_info=info)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3),
                    jnp.float32)
    variables = est.init(jax.random.PRNGKey(0), x)
    hm, tags = est.infer(variables, x, info.flip_index)
    assert hm.shape[1] == 17
    assert tags.shape[1] == 1 and tags.shape[-1] == 2
    assert np.isfinite(np.asarray(tags)).all()

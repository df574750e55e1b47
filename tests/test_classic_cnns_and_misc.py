"""Classic CNN backbones, CrowdPose eval, MultiTask model tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_classic_backbone_shapes():
    from vitpose_tpu.models.classic_cnns import VGG, SEResNet, CPM
    x = jnp.ones((1, 64, 48, 3))
    m = VGG(16)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    assert m.apply(v, x, train=False).shape[-1] == 512
    m = SEResNet(50)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    assert m.apply(v, x, train=False).shape[-1] == 2048
    m = CPM(out_channels=5, num_stages=3, feat_channels=16)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    outs = m.apply(v, x, train=False)
    assert len(outs) == 3 and outs[0].shape == (1, 5, 8, 6)


def test_crowdpose_eval_protocol():
    from vitpose_tpu.data import CocoIndex, DatasetInfo
    from vitpose_tpu.eval.cocoeval import evaluate_crowdpose
    gt = CocoIndex("/root/reference/tests/data/crowdpose/"
                   "test_crowdpose.json")
    info = DatasetInfo.load('crowdpose')
    rng = np.random.RandomState(0)
    dets = []
    for img_id in gt.getImgIds():
        for ann in gt.loadAnns(gt.getAnnIds(imgIds=img_id)):
            kp = np.asarray(ann['keypoints'], np.float64).reshape(-1, 3)
            kp[:, :2] += rng.randn(len(kp), 2) * 2
            kp[:, 2] = 0.9
            dets.append(dict(image_id=img_id, category_id=1,
                             keypoints=kp.flatten().tolist(),
                             score=0.95))
    dt = gt.loadRes(dets)
    stats = evaluate_crowdpose(gt, dt, sigmas=info.sigmas)
    assert stats['AP'] > 0.5          # near-GT detections
    for k in ('AP (E)', 'AP (M)', 'AP (H)'):
        assert k in stats


def test_multitask_model():
    from vitpose_tpu.models.multitask import (MultiTaskModel,
                                              multitask_loss)
    from vitpose_tpu.models.resnet import ResNet
    from vitpose_tpu.models.heads import HeatmapHead
    from vitpose_tpu.models.heads_extra import RegressionHead
    from vitpose_tpu.models.losses import joints_mse_loss
    from vitpose_tpu.models.losses_regression import smooth_l1_loss

    model = MultiTaskModel(
        backbone=ResNet(depth=18),
        heads=(HeatmapHead(out_channels=5, deconv_filters=(16,),
                           deconv_kernels=(4,)),
               RegressionHead(num_joints=5)))
    x = jnp.ones((2, 64, 48, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    outs = model.apply(v, x, train=False)
    assert len(outs) == 2
    assert outs[1].shape == (2, 5, 2)

    hm_target = jnp.zeros((2, 5, outs[0].shape[1], outs[0].shape[2]))
    total, losses = multitask_loss(
        [outs[0].transpose(0, 3, 1, 2), outs[1]],
        [hm_target, jnp.zeros((2, 5, 2))],
        [jnp.ones((2, 5)), jnp.ones((2, 5, 2))],
        [joints_mse_loss, smooth_l1_loss])
    assert np.isfinite(float(total))
    assert 'loss_head_0' in losses and 'loss_head_1' in losses


def test_cosine_schedule():
    from vitpose_tpu.train.optim import OptimConfig, make_lr_schedule
    cfg = OptimConfig(base_lr=1e-3, warmup_iters=10, total_epochs=10)
    sched = make_lr_schedule(cfg, steps_per_epoch=100, policy='cosine')
    assert float(sched(10)) == pytest.approx(1e-3, rel=1e-3)
    # reference cosine_scheduler (mmcv_custom/checkpoint.py:292) anneals
    # over the POST-warmup span: half lr lands at warmup + span/2 = 505
    assert float(sched(505)) == pytest.approx(5e-4, rel=1e-3)
    assert float(sched(500)) == pytest.approx(5e-4, rel=2e-2)
    assert float(sched(1000)) < 1e-6

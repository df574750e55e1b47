"""PoseWarper video detector + MPI-INF-3DHP metrics tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_posewarper_forward():
    from vitpose_tpu.models.posewarper import PoseWarper
    from vitpose_tpu.models.resnet import ResNet
    from vitpose_tpu.models.necks import PoseWarperNeck
    from vitpose_tpu.models.heads import HeatmapHead

    model = PoseWarper(
        backbone=ResNet(depth=18),
        neck=PoseWarperNeck(out_channels=16, dilations=(1, 2)),
        head=HeatmapHead(out_channels=17, deconv_filters=(16,),
                         deconv_kernels=(4,)))
    frames = jnp.ones((1, 3, 64, 48, 3))
    v = model.init(jax.random.PRNGKey(0), frames, train=False)
    out = model.apply(v, frames, train=False)
    assert out.shape[:2] == (1, 17)
    assert np.isfinite(np.asarray(out)).all()


def test_3dhp_metrics():
    from vitpose_tpu.data.mpi_inf_3dhp import (keypoint_3d_pck,
                                               keypoint_3d_auc)
    rng = np.random.RandomState(0)
    gt = rng.randn(6, 17, 3) * 100
    mask = np.ones((6, 17), bool)
    assert keypoint_3d_pck(gt, gt, mask) == 100.0
    pred = gt + rng.randn(6, 17, 3) * 50   # ~86mm mean offset
    pck = keypoint_3d_pck(pred, gt, mask)
    assert 30 < pck < 100
    auc = keypoint_3d_auc(pred, gt, mask)
    assert 0 < auc < pck


def test_3dhp_dataset_on_h36m_format():
    """The 3DHP dataset class shares the npz schema — exercise it on the
    H36M fixture."""
    from vitpose_tpu.data.mpi_inf_3dhp import MpiInf3dhpDataset
    ds = MpiInf3dhpDataset(
        "/root/reference/tests/data/h36m/test_h36m_body3d.npz", seq_len=1)
    preds = np.stack([ds.joints_3d[i][..., :3] for i in range(4)])
    stats = ds.evaluate([dict(preds=preds, target_idxs=[0, 1, 2, 3])],
                        metric=['3dpck', '3dauc', 'mpjpe'])
    assert stats['3DPCK'] == 100.0
    assert stats['3DAUC'] > 95.0
    assert stats['MPJPE'] < 1e-6

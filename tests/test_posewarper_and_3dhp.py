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


REF_PT = "/root/reference/tests/data/posetrack18"
ANN_PT = f"{REF_PT}/annotations/test_posetrack18_val.json"


def test_posetrack_video_dataset_windows():
    """Video records carry key frame + supporting frames: test indices
    (-2,-1,0,1,2) skip 0 (key is always first), missing support files
    fall back to the key frame (the fixture only ships frame 000000)."""
    from vitpose_tpu.data.posetrack import PoseTrackVideoDataset
    ds = PoseTrackVideoDataset(ANN_PT, f'{REF_PT}/', test_mode=True,
                               use_gt_bbox=True)
    assert len(ds.db) > 0
    assert ds.num_frames == 5
    for rec in ds.db:
        files = rec['image_files']
        assert len(files) == 5
        assert files[0] == rec['image_file']
        # fixture has only 000000.jpg per sequence -> all supports fall
        # back to the key frame
        assert all(f == files[0] for f in files[1:])
        assert rec['frame_weight'].shape == (5,)
        assert rec['nframes'] > 1


def test_posetrack_video_dataset_train_indices():
    """Fixed train indices include 0 (reference does not skip the key
    index in train mode) and the frame_weight switches to the train
    tuple."""
    from vitpose_tpu.data.posetrack import PoseTrackVideoDataset
    ds = PoseTrackVideoDataset(ANN_PT, f'{REF_PT}/', test_mode=False,
                               frame_indices_train=[-1, 0, 1],
                               frame_weight_train=(0.2, 0.2, 0.4, 0.2))
    assert ds.num_frames == 4          # key + 3 train indices
    assert tuple(ds.db[0]['frame_weight']) == (0.2, 0.2, 0.4, 0.2)


@pytest.mark.slow
def test_posewarper_train_and_eval_cli(tmp_path):
    """Config-driven PoseWarper: 2 train steps on the PoseTrack fixture
    -> final.npz -> tools/test.py family dispatch computes poseval-style
    mAP (finite, with per-part groups)."""
    import importlib.util
    import json
    import os
    import sys
    from vitpose_tpu.train.loop import train_model

    wd = str(tmp_path)
    cfgd = dict(
        model=dict(family='posewarper', backbone_type='resnet',
                   backbone_overrides=dict(depth=18),
                   neck=dict(out_channels=16, dilations=(1, 2)),
                   head_overrides=dict(deconv_filters=(16,),
                                       deconv_kernels=(4,)),
                   out_channels=17),
        data=dict(dataset='posetrack18', family='posetrack_video',
                  image_size=(96, 128), heatmap_size=(6, 8),
                  frame_indices=(-1, 0, 1), batch_size=2,
                  train=dict(ann_file=ANN_PT, img_prefix=f'{REF_PT}/'),
                  val=dict(ann_file=ANN_PT, img_prefix=f'{REF_PT}/')),
        target=dict(encoding='MSRA', sigma=1.0),
        test_cfg=dict(flip_test=True, shift_heatmap=True),
        optimizer=dict(base_lr=1e-4, total_epochs=1),
        runtime=dict(work_dir=wd))
    variables, metrics = train_model(cfgd, max_steps=2)
    assert np.isfinite(metrics['heatmap_loss'])
    assert os.path.exists(os.path.join(wd, 'final.npz'))

    cfg_path = os.path.join(wd, 'cfg.py')
    with open(cfg_path, 'w') as f:
        for k, v in cfgd.items():
            f.write(f"{k} = {v!r}\n")
    spec = importlib.util.spec_from_file_location(
        '_test_cli_pw', '/root/repo/tools/test.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = ['tools/test.py', cfg_path, os.path.join(wd, 'final.npz'),
                '--out', os.path.join(wd, 'stats.json')]
    try:
        mod.main()
    finally:
        sys.argv = old
    stats = json.load(open(os.path.join(wd, 'stats.json')))
    assert 'Total AP' in stats and np.isfinite(stats['Total AP'])
    assert 'Wri AP' in stats


def test_save_best_mode_inference(tmp_path):
    """_save_best_ckpt infers less-is-better for error metrics (MPJPE)
    and greater-is-better otherwise, without an explicit mode."""
    import os
    from vitpose_tpu.train.interhand_loop import _save_best_ckpt

    wd = str(tmp_path)
    cfg = dict(runtime=dict(save_best='MPJPE'))
    varset = {'w': np.zeros(2)}
    best = _save_best_ckpt(cfg, wd, {'MPJPE': 50.0}, varset, None)
    assert best == 50.0 and os.path.exists(os.path.join(wd, 'best.npz'))
    # worse (higher) MPJPE must NOT overwrite best
    best = _save_best_ckpt(cfg, wd, {'MPJPE': 60.0}, varset, best)
    assert best == 50.0
    best = _save_best_ckpt(cfg, wd, {'MPJPE': 40.0}, varset, best)
    assert best == 40.0
    # AP-style metric: greater is better; accepted from evaluation too
    cfg2 = dict(evaluation=dict(save_best='Total AP'))
    best2 = _save_best_ckpt(cfg2, wd, {'Total AP': 10.0}, varset, None)
    best2 = _save_best_ckpt(cfg2, wd, {'Total AP': 5.0}, varset, best2)
    assert best2 == 10.0
    best2 = _save_best_ckpt(cfg2, wd, {'Total AP': 12.0}, varset, best2)
    assert best2 == 12.0


def test_posewarper_neck_per_dilation_kernels():
    """One deformable kernel PER dilation (reference posewarper_neck.py
    builds a DeformConv2d per dilation), identity-initialized (center-tap
    eye, reference init_weights filler)."""
    import jax
    import jax.numpy as jnp
    from vitpose_tpu.models.necks import PoseWarperNeck

    neck = PoseWarperNeck(out_channels=8, inner_channels=16, num_blocks=2)
    key = jnp.zeros((1, 16, 16, 8))
    sups = jnp.zeros((1, 2, 16, 16, 8))
    v = neck.init(jax.random.PRNGKey(0), key, sups)
    names = [f'deform_conv_{i}' for i in range(5)]
    for n in names:
        assert n in v['params'], sorted(v['params'])
        w = np.asarray(v['params'][n])
        k = w.shape[0]
        np.testing.assert_allclose(w[k // 2, k // 2], np.eye(8), atol=0)
        center_mass = np.abs(w).sum() - np.abs(w[k // 2, k // 2]).sum()
        assert center_mass == 0.0                 # all other taps zero


@pytest.mark.slow
def test_posewarper_cli_eval_reference_pth(tmp_path):
    """tools/test.py CONFIG ckpt.pth for the posewarper family with the
    REFERENCE stage-2 checkpoint layout: backbone + neck tensors only, NO
    keypoint_head entries (the stage-2 head is a parameter-less identity,
    hrnet_w48_..._posewarper_stage2.py:87-88; ADVICE r4 medium). The CLI
    must convert, build the identity-head model, and produce finite
    poseval mAP on the PoseTrack fixture."""
    import importlib.util
    import json
    import os
    import sys

    torch = pytest.importorskip('torch')
    sys.path.insert(0, os.path.dirname(__file__))
    import ref_cnn_loader as L

    pw = L.ref_posewarper_neck()
    bb = L.ref_resnet().ResNet(depth=18, in_channels=3)
    bb.eval()
    neck = pw.PoseWarperNeck(in_channels=512, out_channels=17,
                             inner_channels=16,
                             res_blocks_cfg=dict(block='BASIC',
                                                 num_blocks=2),
                             deform_groups=17, dilations=(1, 2))
    neck.eval()
    sd = {'backbone.' + k: v for k, v in bb.state_dict().items()}
    sd.update({'neck.' + k: v for k, v in neck.state_dict().items()})
    assert not any(k.startswith('keypoint_head.') for k in sd)
    ckpt = tmp_path / 'posewarper_stage2_rand.pth'
    torch.save({'state_dict': sd}, ckpt)

    wd = str(tmp_path)
    cfgd = dict(
        model=dict(family='posewarper', backbone_type='resnet',
                   backbone_overrides=dict(depth=18),
                   neck=dict(out_channels=17, inner_channels=16,
                             num_blocks=2, deform_groups=17,
                             dilations=(1, 2)),
                   out_channels=17),
        # identity head -> heatmaps at the resnet18 1/32 feature stride
        data=dict(dataset='posetrack18', family='posetrack_video',
                  image_size=(96, 128), heatmap_size=(3, 4),
                  frame_indices=(-1, 0, 1), batch_size=2,
                  val=dict(ann_file=ANN_PT, img_prefix=f'{REF_PT}/')),
        test_cfg=dict(flip_test=True, shift_heatmap=True),
        runtime=dict(work_dir=wd))
    cfg_path = os.path.join(wd, 'cfg.py')
    with open(cfg_path, 'w') as f:
        for k, v in cfgd.items():
            f.write(f"{k} = {v!r}\n")
    spec = importlib.util.spec_from_file_location(
        '_test_cli_pw_pth', '/root/repo/tools/test.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = ['tools/test.py', cfg_path, str(ckpt),
                '--out', os.path.join(wd, 'stats.json')]
    try:
        mod.main()
    finally:
        sys.argv = old
    stats = json.load(open(os.path.join(wd, 'stats.json')))
    assert 'Total AP' in stats and np.isfinite(stats['Total AP'])

"""tools/model_split.py (ViTPose+ -> single-task checkpoints) and the
pose-tracking API — previously untested components."""
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, 'tests')
sys.path.insert(0, 'tools')
from ref_loader import ref_vit_moe, ref_simple_head


def _torch_sd(*mods_with_prefix):
    sd = {}
    for prefix, m in mods_with_prefix:
        sd.update({prefix + k: v.detach().numpy()
                   for k, v in m.state_dict().items()})
    return sd


def test_model_split_expert_equivalence():
    """split_one(sd, expert_id=i) must produce a SINGLE-task checkpoint
    whose plain (non-MoE) model reproduces the MoE model's expert-i path
    with associate head i-1, truncated to the dataset keypoint count
    (reference tools/model_split.py:38-88)."""
    from model_split import split_one

    torch.manual_seed(21)
    tv = ref_vit_moe().ViTMoE(img_size=(64, 48), patch_size=16,
                              embed_dim=32, depth=2, num_heads=4,
                              qkv_bias=True, num_expert=3, part_features=8)
    head_mod = ref_simple_head()
    main_head = head_mod.TopdownHeatmapSimpleHead(
        in_channels=32, out_channels=17, num_deconv_layers=2,
        num_deconv_filters=(16, 16), num_deconv_kernels=(4, 4),
        extra=dict(final_conv_kernel=1))
    assoc_head = head_mod.TopdownHeatmapSimpleHead(
        in_channels=32, out_channels=17, num_deconv_layers=2,
        num_deconv_filters=(16, 16), num_deconv_kernels=(4, 4),
        extra=dict(final_conv_kernel=1))
    tv.eval(), main_head.eval(), assoc_head.eval()

    x = np.random.RandomState(21).randn(2, 3, 64, 48).astype(np.float32)
    with torch.no_grad():
        feat = tv(torch.from_numpy(x),
                  torch.from_numpy(np.array([1, 1])))
        # expert 1 routes through associate head 0; split truncates the
        # final conv to the dataset's 14 keypoints
        ref = assoc_head(feat).numpy()[:, :14]

    sd = _torch_sd(('backbone.', tv), ('keypoint_head.', main_head),
                   ('associate_keypoint_heads.0.', assoc_head))
    split_sd = split_one(sd, expert_id=1, num_kpts=14, depth=2)
    assert not any('.experts.' in k for k in split_sd)
    assert not any(k.startswith('associate_keypoint_heads') for k in
                   split_sd)

    from vitpose_tpu.models import TopDownModel, make_config
    from vitpose_tpu.models.vit import ViTConfig
    from vitpose_tpu.utils.torch_ckpt import convert_topdown_checkpoint
    cfg = make_config('s', img_size=(64, 48), out_channels=14,
                      flip_test=False)
    cfg = cfg.__class__(**{**cfg.__dict__,
                           'backbone': ViTConfig(img_size=(64, 48),
                                                 embed_dim=32, depth=2,
                                                 num_heads=4),
                           'deconv_filters': (16, 16)})
    variables = convert_topdown_checkpoint(split_sd, cfg)
    model = TopDownModel(cfg)
    out = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      train=False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_get_track_id_continuity():
    """IoU tracking: overlapping poses keep their ids across frames, a new
    person gets a fresh id, and sparse detections are dropped (reference
    inference_tracking.py:167)."""
    from vitpose_tpu.api.tracking import get_track_id

    def pose(cx, cy, n_vis=10):
        kp = np.zeros((17, 3), np.float32)
        kp[:n_vis, 0] = cx + np.arange(n_vis)
        kp[:n_vis, 1] = cy + np.arange(n_vis)
        kp[:n_vis, 2] = 0.9
        return dict(keypoints=kp,
                    bbox=np.array([cx, cy, cx + 40.0, cy + 80.0, 1.0]))

    frame1 = [pose(10, 10), pose(200, 50)]
    frame1, next_id = get_track_id(frame1, [], next_id=0)
    assert [r['track_id'] for r in frame1] == [0, 1]

    # frame 2: both move slightly; a third person appears
    frame2 = [pose(205, 52), pose(12, 11), pose(400, 300)]
    frame2, next_id = get_track_id(
        frame2, [dict(r) for r in frame1], next_id=next_id)
    ids = {tuple(np.asarray(r['bbox'][:2]).astype(int)): r['track_id']
           for r in frame2}
    assert ids[(12, 11)] == 0          # same person as (10, 10)
    assert ids[(205, 52)] == 1         # same person as (200, 50)
    assert ids[(400, 300)] == 2        # new person, new id
    assert next_id == 3

    # sparse detection (too few visible kpts) is dropped with id -1
    frame3 = [pose(600, 600, n_vis=2)]
    frame3, next_id = get_track_id(frame3, [], next_id=next_id)
    assert frame3[0]['track_id'] == -1
    assert next_id == 3


def test_get_track_id_oks_mode():
    from vitpose_tpu.api.tracking import get_track_id

    def pose(cx):
        kp = np.zeros((17, 3), np.float32)
        kp[:, 0] = cx + np.linspace(0, 30, 17)
        kp[:, 1] = 50 + np.linspace(0, 60, 17)
        kp[:, 2] = 0.9
        return dict(keypoints=kp,
                    bbox=np.array([cx, 50, cx + 40.0, 130.0, 1.0]),
                    area=40.0 * 80.0)

    last, next_id = get_track_id([pose(100)], [], next_id=0)
    cur, next_id = get_track_id([pose(103)], [dict(r) for r in last],
                                next_id=next_id, use_oks=True)
    assert cur[0]['track_id'] == 0 and next_id == 1


def test_track_id_xywh_and_bboxless_results():
    """Review-finding guards: (a) xywh boxes (the default format of
    inference_top_down_pose_model) must track stably via
    bbox_format='xywh' — treating them as corners gave zero IoU and a
    fresh id every frame; (b) bottom-up results carrying 'area' but no
    'bbox' must not crash IoU tracking."""
    from vitpose_tpu.api.tracking import get_track_id

    kp = np.zeros((17, 3), np.float32)
    kp[:, 0] = np.linspace(310, 370, 17)
    kp[:, 1] = np.linspace(110, 280, 17)
    kp[:, 2] = 1.0

    def person(x):
        return {'bbox': np.array([x, 100.0, 80.0, 200.0]),  # xywh
                'keypoints': kp.copy()}

    r0, next_id = get_track_id([person(300.0)], [], 0, bbox_format='xywh')
    r1, next_id = get_track_id([person(305.0)], [dict(r) for r in r0],
                               next_id, bbox_format='xywh')
    assert r0[0]['track_id'] == r1[0]['track_id'] == 0
    assert next_id == 1
    # converted in place to xyxy: corners, not sizes
    assert r1[0]['bbox'][2] > 300

    # bottom-up style: area present, bbox absent
    bu = [{'keypoints': kp.copy(), 'area': 1000.0}]
    t0, nid = get_track_id([dict(p) for p in bu], [], 0)
    t1, nid = get_track_id([dict(p) for p in bu],
                           [dict(r) for r in t0], nid)
    assert t1[0]['track_id'] == t0[0]['track_id']


def test_lifter_causal_target_and_traj_output():
    """causal windows target the LAST frame (reference target_idx=-1) and
    with_traj lifters return keypoints_3d + traj without crashing."""
    import jax
    from vitpose_tpu.models.pose3d import PoseLifter
    from vitpose_tpu.api.inference_3d import (extract_pose_sequence,
                                              inference_pose_lifter_model)

    model = PoseLifter(num_joints=17, stem_channels=32, kernel_sizes=(3, 3),
                       with_traj=True)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, np.zeros((1, 9, 17, 2), np.float32))

    def frame(i):
        kp = np.full((17, 3), float(i), np.float32)
        return [{'keypoints': kp, 'track_id': 0}]

    frames = [frame(i) for i in range(30)]
    seq = extract_pose_sequence(frames, 20, causal=True, seq_len=9)
    assert len(seq) == 9 and seq[-1][0]['keypoints'][0, 0] == 20.0
    res = inference_pose_lifter_model(model, variables, seq,
                                      image_size=(100, 100), causal=True)
    # the returned person dict is the TARGET (last) frame's person
    assert res[0]['keypoints'][0, 0] == 20.0
    assert res[0]['keypoints_3d'].shape == (17, 3)
    assert res[0]['traj'].shape == (1, 3)

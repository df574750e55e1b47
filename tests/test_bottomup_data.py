"""Bottom-up dataset, mask decoding, AE target tests + lightweight
backbones smoke."""
import numpy as np
import pytest

REF = "/root/reference/tests/data/coco"


def test_mask_polygon_and_rle():
    from vitpose_tpu.data.mask import segmentation_to_mask, rle_to_mask
    # polygon square
    m = segmentation_to_mask([[10, 10, 30, 10, 30, 30, 10, 30]], 40, 40)
    assert m[20, 20] == 1 and m[5, 5] == 0
    # uncompressed RLE: column-major runs
    m2 = rle_to_mask([4, 4, 8], (4, 4))
    assert m2.sum() == 4
    assert m2[:, 1].sum() == 4        # second column all ones


def test_compressed_rle_roundtrip_against_known():
    from vitpose_tpu.data.mask import decode_compressed_rle
    # encoding of [6, 1, 40, 4, 5] per the COCO spec example
    counts = decode_compressed_rle('61X13mN000`0')
    assert counts[0] == 6 and counts[1] == 1


def test_bottomup_dataset_records():
    from vitpose_tpu.data.bottomup import BottomUpCocoDataset
    ds = BottomUpCocoDataset(f"{REF}/test_coco.json", REF + "/",
                             input_size=512, output_sizes=(128,))
    assert len(ds) == 4
    rec = ds.record(0)
    assert rec['joints'].shape == (30, 17, 3)
    assert rec['num_people'] >= 1
    mask = ds.build_loss_mask(rec)
    assert mask.shape == (rec['height'], rec['width'])


def test_generate_ae_targets():
    from vitpose_tpu.data.bottomup import (BottomUpCocoDataset,
                                           generate_ae_targets)
    ds = BottomUpCocoDataset(f"{REF}/test_coco.json", REF + "/")
    rec = ds.record(0)
    # scale joints into a 512 input frame
    s = 512.0 / max(rec['width'], rec['height'])
    joints = rec['joints'].copy()
    joints[..., :2] *= s
    mask = ds.build_loss_mask(rec)
    t = generate_ae_targets(joints, mask, 512, 128, sigma=2.0)
    assert t['heatmaps'].shape == (17, 128, 128)
    assert float(np.asarray(t['heatmaps']).max()) > 0.9
    assert t['ae_joints'].shape == (30, 17, 2)
    # visible ae joints point at in-bounds flat indices
    ae = np.asarray(t['ae_joints'])
    vis = ae[..., 1] > 0
    assert (ae[..., 0][vis] < 128 * 128).all()
    # AE loss consumes these shapes directly
    import jax.numpy as jnp
    from vitpose_tpu.models.losses_regression import ae_tag_loss
    tags = jnp.zeros((1, 17 * 128 * 128, 1))
    push, pull = ae_tag_loss(tags, np.asarray(t['ae_joints'])[None])
    assert np.isfinite(float(push[0])) and np.isfinite(float(pull[0]))


def test_bottomup_evaluate_perfect_gt():
    """BottomUpCocoDataset.evaluate (reference bottom_up_coco.py:143):
    feeding the GT keypoints back as grouped predictions yields AP ~1."""
    from vitpose_tpu.data.bottomup import BottomUpCocoDataset
    ds = BottomUpCocoDataset(f"{REF}/test_coco.json", REF + "/")
    results = []
    for idx in range(len(ds)):
        rec = ds.record(idx)
        people, scores = [], []
        for m in range(rec['num_people']):
            kp = rec['joints'][m].copy()          # [K, 3] (x, y, vis)
            kp[:, 2] = np.where(kp[:, 2] > 0, 0.95, 0.0)
            people.append(kp)
            scores.append(1.0)
        results.append(dict(preds=people, scores=scores,
                            image_paths=[rec['image_file']]))
    stats = ds.evaluate(results)
    assert stats['AP'] > 0.95, stats
    assert stats['AR'] > 0.95
    # NMS path keeps it together
    stats2 = ds.evaluate(results, use_nms=True, oks_thr=0.9)
    assert stats2['AP'] > 0.9


def test_bottomup_crowdpose_protocol():
    """Bottom-up CrowdPose evaluate routes to the crowd protocol
    (reference BottomUpCrowdPoseDataset, iouType='keypoints_crowd')."""
    from vitpose_tpu.data.bottomup import BottomUpCocoDataset
    ref = '/root/reference/tests/data/crowdpose'
    ds = BottomUpCocoDataset(f"{ref}/test_crowdpose.json", ref + "/",
                             dataset_info='crowdpose')
    results = []
    for idx in range(len(ds)):
        rec = ds.record(idx)
        people, scores = [], []
        for m in range(rec['num_people']):
            kp = rec['joints'][m].copy()
            kp[:, 2] = np.where(kp[:, 2] > 0, 0.95, 0.0)
            people.append(kp)
            scores.append(1.0)
        results.append(dict(preds=people, scores=scores,
                            image_paths=[rec['image_file']]))
    stats = ds.evaluate(results)
    assert 'AP' in stats and 'AP (E)' in stats or 'AP(E)' in stats \
        or any('E' in k for k in stats), stats
    assert stats['AP'] > 0.9, stats


@pytest.mark.parametrize('use_udp', [False, True])
def test_generate_ae_targets_joints_encoder_golden(use_udp):
    """generate_ae_targets == reference JointsEncoder flat indices +
    HeatmapGenerator maps, in both joint-scaling conventions (the UDP
    pipeline scales input->output joints by (S-1)/(in-1); the biased one
    by S/in — bottom_up_transform.py:210,255)."""
    import sys
    sys.path.insert(0, '/root/repo/tests')
    from ref_cnn_loader import ref_bottom_up_transform
    from vitpose_tpu.data.bottomup import generate_ae_targets

    but = ref_bottom_up_transform()
    rng = np.random.RandomState(11)
    joints = np.zeros((3, 17, 3), np.float32)
    joints[..., 0] = rng.uniform(-10, 522, (3, 17))
    joints[..., 1] = rng.uniform(-10, 522, (3, 17))
    joints[..., 2] = (rng.rand(3, 17) > 0.2).astype(np.float32)
    mask = np.ones((512, 512), np.float32)

    out = generate_ae_targets(joints, mask, 512, 128, sigma=2.0,
                              use_udp=use_udp)

    ratio = (127.0 / 511.0) if use_udp else (128.0 / 512.0)
    scaled = joints.copy()
    scaled[..., :2] *= ratio
    ref_hm = but.HeatmapGenerator(np.array([128, 128]), 17, sigma=2,
                                  use_udp=use_udp)(scaled)
    np.testing.assert_allclose(np.asarray(out['heatmaps']), ref_hm,
                               atol=1e-5)

    enc = but.JointsEncoder(30, 17, np.array([128, 128]), True)(scaled)
    got = np.asarray(out['ae_joints'])
    # the reference compacts visible joints to the front per person; ours
    # keeps joint slots — compare the SET of (flat index mod K*S*S) pairs
    for p in range(3):
        ref_set = {(int(v[0]) % (128 * 128), 1)
                   for v in enc[p] if v[1] > 0}
        # reference flat index includes joint offset idx*S*S; recover set
        ref_pairs = sorted(int(v[0]) for v in enc[p] if v[1] > 0)
        got_pairs = sorted(
            j * 128 * 128 + int(got[p, j, 0])
            for j in range(17) if got[p, j, 1] > 0)
        assert got_pairs == ref_pairs

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

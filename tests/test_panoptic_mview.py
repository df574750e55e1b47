"""Panoptic multiview dataset on the real fixture + camera consistency."""
import glob

import numpy as np
import pytest

SEQS = sorted(glob.glob("/root/reference/tests/data/panoptic_body3d/*"))


def test_panoptic_loading():
    from vitpose_tpu.data.panoptic_mview import PanopticMviewDataset
    ds = PanopticMviewDataset(SEQS)
    assert len(ds) >= 2
    frame = ds[0]
    assert len(frame['people']) >= 1
    p = frame['people'][0]
    assert p['joints_3d'].shape == (19, 3)
    assert len(frame['cameras']) > 0


def test_panoptic_projection_in_bounds():
    """GT 3D joints should project near the camera's principal point
    neighborhood (i.e. produce finite in-front-of-camera pixels)."""
    from vitpose_tpu.data.panoptic_mview import PanopticMviewDataset
    ds = PanopticMviewDataset(SEQS)
    frame = ds[0]
    joints = frame['people'][0]['joints_3d']
    projected_ok = 0
    for cam in frame['cameras'][:8]:
        cam_pts = np.asarray(cam.world_to_camera(joints))
        if (cam_pts[:, 2] > 0).all():        # in front of camera
            pix = np.asarray(cam.camera_to_pixel(cam_pts))
            if np.isfinite(pix).all() and (np.abs(pix) < 1e5).all():
                projected_ok += 1
    assert projected_ok >= 1


def test_panoptic_evaluate_roundtrip():
    from vitpose_tpu.data.panoptic_mview import PanopticMviewDataset
    ds = PanopticMviewDataset(SEQS)
    results = []
    for i in range(len(ds)):
        frame = ds[i]
        results.append([(p['joints_3d'], 1.0) for p in frame['people']])
    stats = ds.evaluate(results, metric=['mpjpe', 'mAP'])
    assert stats['MPJPE 500mm'] < 1e-6
    assert stats['RECALL 500mm'] == 1.0
    # perfect detections at every threshold of the reference protocol
    # (the reference's +1e-5 recall epsilon keeps these fractionally
    # below 1 even for perfect detections)
    assert stats['mAP'] > 0.999 and stats['mAR'] > 0.999
    for t in (25, 50, 75, 100, 125, 150):
        assert stats[f'AP {t}'] > 0.99


def test_panoptic_ap_golden_vs_reference():
    """Our score-ranked AP/MPJPE/recall helpers vs the reference's
    _eval_list_to_ap/_eval_list_to_mpjpe/_eval_list_to_recall
    (body3d_mview_direct_panoptic_dataset.py:420,451,465) on a synthetic
    eval list with duplicates, misses and score ties."""
    from vitpose_tpu.data.panoptic_mview import PanopticMviewDataset
    rng = np.random.RandomState(0)
    eval_list = [dict(mpjpe=float(rng.uniform(5, 300)),
                      score=float(rng.uniform()),
                      gt_id=int(rng.randint(0, 12)))
                 for _ in range(60)]
    total_gt = 15

    def ref_ap(eval_list, total_gt, threshold):
        eval_list = sorted(eval_list, key=lambda k: -k['score'])
        total_num = len(eval_list)
        tp = np.zeros(total_num)
        fp = np.zeros(total_num)
        gt_det = []
        for i, item in enumerate(eval_list):
            if item['mpjpe'] < threshold and item['gt_id'] not in gt_det:
                tp[i] = 1
                gt_det.append(item['gt_id'])
            else:
                fp[i] = 1
        tp, fp = np.cumsum(tp), np.cumsum(fp)
        recall = tp / (total_gt + 1e-5)
        precise = tp / (tp + fp + 1e-5)
        for n in range(total_num - 2, -1, -1):
            precise[n] = max(precise[n], precise[n + 1])
        precise = np.concatenate(([0], precise, [0]))
        recall = np.concatenate(([0], recall, [1]))
        index = np.where(recall[1:] != recall[:-1])[0]
        ap = np.sum((recall[index + 1] - recall[index])
                    * precise[index + 1])
        return ap, recall[-2]

    for t in (25, 75, 150, 500):
        got = PanopticMviewDataset._ap(eval_list, total_gt, t)
        want = ref_ap(eval_list, total_gt, t)
        np.testing.assert_allclose(got, want, rtol=1e-9)
    got_m = PanopticMviewDataset._matched_mpjpe(eval_list, 500)
    got_r = PanopticMviewDataset._recall(eval_list, total_gt, 500)
    # reference mpjpe/recall recomputed inline
    ranked = sorted(eval_list, key=lambda k: -k['score'])
    seen, errs = [], []
    for item in ranked:
        if item['mpjpe'] < 500 and item['gt_id'] not in seen:
            errs.append(item['mpjpe'])
            seen.append(item['gt_id'])
    assert abs(got_m - np.mean(errs)) < 1e-9
    ids = {e['gt_id'] for e in eval_list if e['mpjpe'] < 500}
    assert got_r == len(ids) / total_gt


def test_heatmap_frame_painter_in_bounds():
    """gt_projected_heatmaps must paint ON the heatmap grid: with
    intrinsics rescaled from the sensor resolution to heatmap pixels
    (heatmap_frame_cameras) the fixture's GT joints produce non-empty
    per-view maps (raw-pixel intrinsics would land ~everything outside a
    64x48 grid and train on blank inputs)."""
    from vitpose_tpu.data.panoptic_mview import PanopticMviewDataset
    from vitpose_tpu.train.voxelpose_loop import (gt_projected_heatmaps,
                                                  heatmap_frame_cameras)

    ds = PanopticMviewDataset(SEQS)
    frame = ds[0]
    hm_size = (64, 64)
    cams = heatmap_frame_cameras(frame['cameras'][:4], hm_size)
    for c, raw in zip(cams, frame['cameras'][:4]):
        assert hasattr(raw, 'resolution')
        assert float(c.f[0]) < float(raw.f[0])     # actually rescaled
    maps = gt_projected_heatmaps(frame, cams, 15, hm_size)
    # at least one view sees the person: peak near 1.0 somewhere
    assert maps.max() > 0.5, maps.max()

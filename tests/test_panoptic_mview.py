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
    stats = ds.evaluate(results)
    assert stats['MPJPE'] < 1e-6
    assert stats['Recall'] == 1.0

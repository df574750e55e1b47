"""Golden test: WholeBody per-part COCO evaluation vs the reference's
vendored _cocoeval with iouType='keypoints_{body,foot,face,lefthand,
righthand,wholebody}' on the reference COCO-WholeBody fixture."""
import importlib.util
import sys
import types

import numpy as np
import pytest

from vitpose_tpu.data import CocoIndex, WholeBodyDataset
from vitpose_tpu.eval.cocoeval import CocoKeypointEval

REF = "/root/reference"
FIXTURE = f"{REF}/tests/data/coco/test_coco_wholebody.json"

PART_IOUTYPE = {
    'body': 'keypoints',
    'foot': 'keypoints_foot',
    'face': 'keypoints_face',
    'lefthand': 'keypoints_lefthand',
    'righthand': 'keypoints_righthand',
    'wholebody': 'keypoints_wholebody',
}
CUTS = {'body': (0, 17), 'foot': (17, 23), 'face': (23, 91),
        'lefthand': (91, 112), 'righthand': (112, 133),
        'wholebody': (0, 133)}


def _load_ref_cocoeval():
    name = "_ref_cocoeval_wb"
    if name in sys.modules:
        return sys.modules[name]
    pkg = types.ModuleType("_refpkg_wb")
    pkg.__path__ = [f"{REF}/mmpose/datasets/datasets/top_down"]
    sys.modules["_refpkg_wb"] = pkg
    mask_stub = types.ModuleType("_refpkg_wb._mask")
    mask_stub.iou = lambda *a, **k: np.zeros((0, 0))
    sys.modules["_refpkg_wb._mask"] = mask_stub
    spec = importlib.util.spec_from_file_location(
        "_refpkg_wb._cocoeval",
        f"{REF}/mmpose/datasets/datasets/top_down/_cocoeval.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_refpkg_wb._cocoeval"] = mod
    spec.loader.exec_module(mod)
    sys.modules[name] = mod
    return mod


def _full_gt_kpts(ann):
    kp = list(ann['keypoints'])
    for part in ('foot_kpts', 'face_kpts', 'lefthand_kpts',
                 'righthand_kpts'):
        kp += list(ann[part])
    return np.asarray(kp, np.float64).reshape(-1, 3)


def _make_detections(gt, rng):
    """Perturbed GT + spurious detections, split into the reference's part
    fields (as _write_coco_keypoint_results does)."""
    dets_split, dets_flat = [], []
    for img_id in gt.getImgIds():
        for ann in gt.loadAnns(gt.getAnnIds(imgIds=img_id)):
            if rng.rand() < 0.2:
                continue
            kp = _full_gt_kpts(ann)
            kp[:, :2] += rng.randn(len(kp), 2) * 6.0
            kp[:, 2] = rng.uniform(0.3, 0.99, len(kp))
            score = float(rng.uniform(0.4, 1.0))
            flat = kp.flatten().tolist()
            dets_flat.append(dict(image_id=img_id, category_id=1,
                                  keypoints=flat, score=score))
            dets_split.append(dict(
                image_id=img_id, category_id=1, score=score,
                keypoints=flat[:17 * 3],
                foot_kpts=flat[17 * 3:23 * 3],
                face_kpts=flat[23 * 3:91 * 3],
                lefthand_kpts=flat[91 * 3:112 * 3],
                righthand_kpts=flat[112 * 3:133 * 3]))
    return dets_split, dets_flat


def _bbox_area_from_body(det):
    body = np.asarray(det['keypoints'][:17 * 3], np.float64).reshape(-1, 3)
    xs, ys = body[:, 0], body[:, 1]
    det['bbox'] = [float(xs.min()), float(ys.min()),
                   float(xs.max() - xs.min()), float(ys.max() - ys.min())]
    det['area'] = float((xs.max() - xs.min()) * (ys.max() - ys.min()))
    return det


@pytest.mark.parametrize("part", list(PART_IOUTYPE))
def test_per_part_eval_matches_reference(part):
    rng = np.random.RandomState(3)
    gt = CocoIndex(FIXTURE)
    dets_split, dets_flat = _make_detections(gt, rng)

    from vitpose_tpu.data.dataset_info import DatasetInfo
    sigmas = np.asarray(DatasetInfo.load('coco_wholebody').sigmas,
                        np.float64)
    s, e = CUTS[part]

    # ours: flat 133-kpt detections + kpt_slice
    dt = gt.loadRes([_bbox_area_from_body(dict(d)) for d in dets_flat])
    ours = CocoKeypointEval(gt, sigmas=sigmas[s:e],
                            kpt_slice=(s, e)).evaluate(dt)

    # reference: split-field detections + iouType
    refmod = _load_ref_cocoeval()
    dt_ref = gt.loadRes([_bbox_area_from_body(dict(d)) for d in dets_split])
    E = refmod.COCOeval(gt, dt_ref, iouType=PART_IOUTYPE[part],
                        sigmas=sigmas[s:e])
    E.params.useSegm = None
    E.evaluate()
    E.accumulate()
    E.summarize()
    names = ['AP', 'AP .5', 'AP .75', 'AP (M)', 'AP (L)',
             'AR', 'AR .5', 'AR .75', 'AR (M)', 'AR (L)']
    for n, r in zip(names, E.stats[:10]):
        assert abs(ours[n] - r) < 1e-6, (part, n, ours[n], r)


def test_wholebody_dataset_evaluate():
    """WholeBodyDataset end-to-end: GT-as-prediction must give wholebody
    AP 1.0 and per-part stats present."""
    ds = WholeBodyDataset(FIXTURE, f"{REF}/tests/data/coco/",
                          test_mode=True, use_gt_bbox=True)
    assert ds.num_joints == 133
    results = []
    for rec in ds.db:
        kp = np.zeros((133, 3), np.float32)
        kp[:, :2] = rec['joints_3d'][:, :2]
        kp[:, 2] = 0.95
        x, y, w, h = rec['bbox']
        c = np.array([x + w / 2, y + h / 2], np.float32)
        s = np.array([w / 200, h / 200], np.float32)
        results.append(dict(
            preds=kp[None], boxes=np.array(
                [[c[0], c[1], s[0], s[1], float(w * h), 1.0]]),
            image_paths=[rec['image_file']],
            bbox_ids=[rec['bbox_id']]))
    stats = ds.evaluate(results)
    assert stats['AP'] > 0.99, stats
    for part in ('body', 'foot', 'face', 'lefthand', 'righthand'):
        assert f'{part}/AP' in stats
    assert stats['body/AP'] > 0.99, stats

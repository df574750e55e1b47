"""Golden test: pure-numpy CocoKeypointEval vs the evaluator the reference
vendors (_cocoeval.py), on the reference's COCO fixture annotations."""
import importlib.util
import sys
import types

import numpy as np
import pytest

from vitpose_tpu.data import CocoIndex
from vitpose_tpu.eval import CocoKeypointEval

REF = "/root/reference"
FIXTURE = f"{REF}/tests/data/coco/test_coco.json"

RNG = np.random.RandomState(7)


def _load_ref_cocoeval():
    name = "_ref_cocoeval"
    if name in sys.modules:
        return sys.modules[name]
    pkg = types.ModuleType("_refpkg")
    pkg.__path__ = [f"{REF}/mmpose/datasets/datasets/top_down"]
    sys.modules["_refpkg"] = pkg
    mask_stub = types.ModuleType("_refpkg._mask")
    mask_stub.iou = lambda *a, **k: np.zeros((0, 0))
    sys.modules["_refpkg._mask"] = mask_stub
    spec = importlib.util.spec_from_file_location(
        "_refpkg._cocoeval",
        f"{REF}/mmpose/datasets/datasets/top_down/_cocoeval.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_refpkg._cocoeval"] = mod
    spec.loader.exec_module(mod)
    sys.modules[name] = mod
    return mod


def make_fake_detections(gt, n_extra_per_img=2, noise=4.0, drop_prob=0.2):
    """Perturbed copies of GT keypoints + random spurious detections."""
    dets = []
    for img_id in gt.getImgIds():
        anns = gt.loadAnns(gt.getAnnIds(imgIds=img_id))
        for ann in anns:
            if RNG.rand() < drop_prob:
                continue
            kp = np.asarray(ann['keypoints'], np.float64).reshape(-1, 3)
            kp[:, :2] += RNG.randn(len(kp), 2) * noise
            kp[:, 2] = RNG.uniform(0.3, 0.99, len(kp))
            dets.append(dict(image_id=img_id, category_id=1,
                             keypoints=kp.flatten().tolist(),
                             score=float(RNG.uniform(0.4, 1.0))))
        img = gt.imgs[img_id]
        for _ in range(n_extra_per_img):
            kp = np.stack([RNG.uniform(0, img['width'], 17),
                           RNG.uniform(0, img['height'], 17),
                           RNG.uniform(0.1, 0.9, 17)], axis=1)
            dets.append(dict(image_id=img_id, category_id=1,
                             keypoints=kp.flatten().tolist(),
                             score=float(RNG.uniform(0.05, 0.9))))
    return dets


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cocoeval_matches_reference(seed):
    global RNG
    RNG = np.random.RandomState(seed)
    gt = CocoIndex(FIXTURE)
    dets = make_fake_detections(gt)
    dt = gt.loadRes(dets)

    ours = CocoKeypointEval(gt).evaluate(dt)

    refmod = _load_ref_cocoeval()
    E = refmod.COCOeval(gt, dt, iouType='keypoints')
    E.params.useSegm = None
    E.evaluate()
    E.accumulate()
    E.summarize()
    ref_stats = E.stats[:10]

    names = ['AP', 'AP .5', 'AP .75', 'AP (M)', 'AP (L)',
             'AR', 'AR .5', 'AR .75', 'AR (M)', 'AR (L)']
    for n, r in zip(names, ref_stats):
        assert abs(ours[n] - r) < 1e-6, (n, ours[n], r)


def test_dataset_loads_fixture():
    from vitpose_tpu.data import TopDownDataset
    ds = TopDownDataset(FIXTURE, f"{REF}/tests/data/coco/",
                        dataset_info='coco', test_mode=False)
    assert len(ds) > 0
    rec = ds[0]
    assert rec['joints_3d'].shape == (17, 3)
    assert rec['bbox'].shape == (4,)


def test_dataset_det_mode():
    from vitpose_tpu.data import TopDownDataset
    ds = TopDownDataset(
        FIXTURE, f"{REF}/tests/data/coco/", dataset_info='coco',
        test_mode=True, use_gt_bbox=False,
        bbox_file=f"{REF}/tests/data/coco/test_coco_det_AP_H_56.json")
    assert len(ds) > 0
    assert all(r['bbox_score'] > 0 for r in ds.db)


def test_dataset_evaluate_roundtrip():
    """Perfect predictions (=GT) must give AP 1.0."""
    from vitpose_tpu.data import TopDownDataset
    ds = TopDownDataset(FIXTURE, f"{REF}/tests/data/coco/",
                        dataset_info='coco', test_mode=True, use_gt_bbox=True)
    gt = ds.coco
    results = []
    for rec in ds.db:
        img_id = ds.name2id[rec['image_file'].split('/')[-1]]
        kp = rec['joints_3d'].copy()
        kp[:, 2] = 0.9
        x, y, w, h = rec['bbox']
        results.append(dict(
            preds=kp[None],
            boxes=np.array([[x + w / 2, y + h / 2, w / 200, h / 200,
                             w * h, 0.95]]),
            image_paths=[rec['image_file']],
            bbox_ids=[rec['bbox_id']],
        ))
    stats = ds.evaluate(results)
    assert stats['AP'] > 0.99, stats


def test_gather_ignore_semantics_match_reference():
    """gt-ignore counts visible keypoints from the keypoint vector (not
    num_keypoints — jsons may omit it) and all-zero-confidence dts are
    dropped, like the reference _prepare (_cocoeval.py:170-173, 221-223);
    evaluation must also not mutate the caller's annotations."""
    import copy
    from vitpose_tpu.data import CocoIndex
    from vitpose_tpu.eval.cocoeval import CocoKeypointEval

    kp_vis = [10.0, 10.0, 2.0] * 17
    kp_zero = [0.0] * 51
    gt = {
        'images': [{'id': 1, 'width': 100, 'height': 100}],
        'annotations': [
            # labeled gt WITHOUT num_keypoints
            dict(id=1, image_id=1, category_id=1, keypoints=kp_vis,
                 bbox=[0, 0, 50, 50], area=2500.0, iscrowd=0),
            # unlabeled gt (all v=0) WITHOUT num_keypoints -> ignored
            dict(id=2, image_id=1, category_id=1, keypoints=kp_zero,
                 bbox=[50, 50, 40, 40], area=1600.0, iscrowd=0),
        ],
        'categories': [{'id': 1, 'name': 'person'}],
    }
    coco = CocoIndex(dataset=gt)
    orig_anns = copy.deepcopy(coco.dataset['annotations'])
    dts = [
        dict(image_id=1, category_id=1, keypoints=kp_vis, score=0.9),
        # all-zero-confidence detection -> dropped, not an FP
        dict(image_id=1, category_id=1, keypoints=kp_zero, score=0.8),
    ]
    coco_dt = coco.loadRes(copy.deepcopy(dts))
    stats = CocoKeypointEval(coco).evaluate(coco_dt)
    # one matchable gt, one perfect dt, bogus dt dropped -> AP/AR = 1.0
    assert stats['AP'] == 1.0 and stats['AR'] == 1.0, stats
    # use_area=False evaluation must not rewrite the caller's areas
    CocoKeypointEval(coco, use_area=False).evaluate(coco_dt)
    for a, b in zip(coco.dataset['annotations'], orig_anns):
        assert a.get('area') == b.get('area')
        assert '_ignore' not in a


def test_crowdpose_gt_ignore_uses_num_keypoints():
    """The keypoints_crowd protocol ignores gts by num_keypoints (vis==2
    count, _cocoeval.py:163-167), not the v>0 vector count: a person with
    only labeled-invisible (v==1) joints is ignored — a detection matching
    it must neither score nor count as an FP against recall."""
    import copy
    from vitpose_tpu.eval.cocoeval import evaluate_crowdpose

    kp_vis = [10.0, 10.0, 2.0] * 14
    kp_v1 = [60.0, 60.0, 1.0] * 14      # labeled but invisible everywhere
    gt = {
        'images': [{'id': 1, 'width': 100, 'height': 100,
                    'crowdIndex': 0.0}],
        'annotations': [
            dict(id=1, image_id=1, category_id=1, keypoints=kp_vis,
                 num_keypoints=14, bbox=[0, 0, 50, 50], iscrowd=0),
            dict(id=2, image_id=1, category_id=1, keypoints=kp_v1,
                 num_keypoints=0, bbox=[40, 40, 40, 40], iscrowd=0),
        ],
        'categories': [{'id': 1, 'name': 'person'}],
    }
    coco = CocoIndex(dataset=gt)
    dts = [dict(image_id=1, category_id=1, keypoints=kp_vis, score=0.9)]
    coco_dt = coco.loadRes(copy.deepcopy(dts))
    sigmas = np.full(14, 0.05)
    stats = evaluate_crowdpose(coco, coco_dt, sigmas=sigmas)
    # were the v==1 gt counted as matchable, AR would be 0.5, not 1.0
    assert stats['AP'] == 1.0 and stats['AR'] == 1.0, stats

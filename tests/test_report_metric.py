"""Golden test for TopDownDataset.evaluate(metric=PCK/AUC/EPE/NME): the
protocol glue (db-ordered preds, bbox thresholds, NME factors) must match
the reference _report_metric built from top_down_eval.py metric functions
(kpt_2d_sview_rgb_img_top_down_dataset.py:191-268)."""
import numpy as np

from ref_loader import ref_top_down_eval

from vitpose_tpu.data import TopDownDataset

REF = "/root/reference"
FIXTURE = f"{REF}/tests/data/coco/test_coco.json"
PREFIX = f"{REF}/tests/data/coco/"


def _fake_results(ds, rng, shuffle=True):
    """Per-record noisy predictions, batched in shuffled order so db
    re-alignment is exercised."""
    order = np.arange(len(ds.db))
    if shuffle:
        rng.shuffle(order)
    results = []
    for i in order:
        rec = ds.db[i]
        kp = np.zeros((ds.num_joints, 3), np.float32)
        kp[:, :2] = rec['joints_3d'][:, :2] + rng.randn(ds.num_joints, 2) * 8
        kp[:, 2] = rng.uniform(0.1, 1.0, ds.num_joints)
        x, y, w, h = rec['bbox']
        results.append(dict(
            preds=kp[None],
            boxes=np.array([[x + w / 2, y + h / 2, w / 200, h / 200,
                             float(w * h), 1.0]]),
            image_paths=[rec['image_file']],
            bbox_ids=[rec['bbox_id']]))
    return results


def test_pck_auc_epe_match_reference_protocol():
    tde = ref_top_down_eval()
    rng = np.random.RandomState(11)
    ds = TopDownDataset(FIXTURE, PREFIX, dataset_info='coco',
                        test_mode=True, use_gt_bbox=True)
    results = _fake_results(ds, rng)
    stats = ds.evaluate(results, metric=['PCK', 'AUC', 'EPE'])

    # reference _report_metric replica with the genuine metric functions
    by_key = {}
    for r in results:
        by_key[(r['image_paths'][0], r['bbox_ids'][0])] = r['preds'][0]
    outputs, gts, masks, thr = [], [], [], []
    for rec in ds.db:
        p = by_key[(rec['image_file'], rec['bbox_id'])]
        outputs.append(p[:, :2])
        gts.append(rec['joints_3d'][:, :2])
        masks.append(rec['joints_3d_visible'][:, 0] > 0)
        t = np.max(rec['bbox'][2:])
        thr.append([t, t])
    outputs, gts = np.asarray(outputs), np.asarray(gts)
    masks, thr = np.asarray(masks), np.asarray(thr)
    _, ref_pck, _ = tde.keypoint_pck_accuracy(outputs, gts, masks, 0.2, thr)
    ref_auc = tde.keypoint_auc(outputs, gts, masks, 30)
    ref_epe = tde.keypoint_epe(outputs, gts, masks)

    assert abs(stats['PCK'] - ref_pck) < 1e-6
    assert abs(stats['AUC'] - ref_auc) < 1e-6
    assert abs(stats['EPE'] - ref_epe) < 1e-5
    assert 0 < stats['PCK'] <= 1


def test_nme_interocular_and_boxsize():
    tde = ref_top_down_eval()
    rng = np.random.RandomState(5)
    ds = TopDownDataset(FIXTURE, PREFIX, dataset_info='coco',
                        test_mode=True, use_gt_bbox=True)
    results = _fake_results(ds, rng, shuffle=False)
    # non-landmark dataset without per-record box_size: NME must hard-fail
    # (a silent factor-1 fallback would report raw pixel error as NME)
    import pytest
    with pytest.raises(KeyError, match='box_size'):
        ds.evaluate(results, metric='NME')
    # with box_size annotated, box-size normalization applies
    for rec in ds.db:
        rec['box_size'] = 1.0
    stats = ds.evaluate(results, metric=['NME', 'EPE'])
    assert abs(stats['NME'] - stats['EPE']) < 1e-5
    for rec in ds.db:
        del rec['box_size']

    # landmark-pair normalization: pretend this is horse10 (pair 0,1)
    ds.info.dataset_name = 'horse10'
    stats2 = ds.evaluate(results, metric='NME')
    outputs = np.stack([results[i]['preds'][0][:, :2]
                        for i in range(len(ds.db))])
    gts = np.stack([r['joints_3d'][:, :2] for r in ds.db])
    masks = np.stack([r['joints_3d_visible'][:, 0] > 0 for r in ds.db])
    inter = np.linalg.norm(gts[:, 0] - gts[:, 1], axis=1, keepdims=True)
    ref = tde.keypoint_nme(outputs, gts, masks, np.tile(inter, [1, 2]))
    assert abs(stats2['NME'] - ref) < 1e-6
    ds.info.dataset_name = 'coco'


def test_mixed_map_and_pck():
    rng = np.random.RandomState(2)
    ds = TopDownDataset(FIXTURE, PREFIX, dataset_info='coco',
                        test_mode=True, use_gt_bbox=True)
    results = _fake_results(ds, rng)
    stats = ds.evaluate(results, metric=['mAP', 'PCK'])
    assert 'AP' in stats and 'PCK' in stats

    try:
        ds.evaluate(results, metric='bogus')
    except KeyError:
        pass
    else:
        raise AssertionError('bogus metric accepted')


def test_keypoints_from_regression_golden():
    """keypoints_from_regression vs reference top_down_eval.py:441."""
    import numpy as np
    from ref_loader import ref_top_down_eval
    from vitpose_tpu.ops import keypoints_from_regression
    ref = ref_top_down_eval()
    rng = np.random.RandomState(0)
    reg = rng.uniform(0, 1, (3, 5, 2)).astype(np.float32)
    center = rng.uniform(50, 200, (3, 2)).astype(np.float32)
    scale = rng.uniform(0.5, 2.0, (3, 2)).astype(np.float32)
    want_p, want_v = ref.keypoints_from_regression(
        reg.copy(), center, scale, [192, 256])
    got_p, got_v = keypoints_from_regression(reg, center, scale,
                                             [192, 256])
    np.testing.assert_allclose(got_p, want_p, atol=1e-4)
    np.testing.assert_allclose(got_v, want_v)


def test_multilabel_classification_accuracy_golden():
    import numpy as np
    from ref_loader import ref_top_down_eval
    from vitpose_tpu.ops import multilabel_classification_accuracy
    ref = ref_top_down_eval()
    rng = np.random.RandomState(1)
    pred = rng.uniform(size=(8, 2)).astype(np.float32)
    gt = (rng.uniform(size=(8, 2)) > 0.5).astype(np.float32)
    for mask in (np.ones((8, 1)), (rng.uniform(size=(8, 2)) > 0.3)):
        want = ref.multilabel_classification_accuracy(
            pred, gt, np.asarray(mask))
        got = multilabel_classification_accuracy(pred, gt,
                                                 np.asarray(mask))
        assert abs(got - want) < 1e-9
    assert multilabel_classification_accuracy(
        pred, gt, np.zeros((8, 1))) == 0.0

"""PoseTrack18 sequence-evaluation protocol on the reference fixture:
per-video grouping + poseval-style PCKh AP."""
import numpy as np

from vitpose_tpu.data import PoseTrackDataset
from vitpose_tpu.data.posetrack import evaluate_posetrack_ap

REF = "/root/reference/tests/data/posetrack18"
ANN = f"{REF}/annotations/test_posetrack18_val.json"


def _gt_results(ds):
    results = []
    for rec in ds.db:
        kp = rec['joints_3d'].copy()
        kp[:, 2] = np.where(rec['joints_3d_visible'][:, 0] > 0, 0.9, 0.0)
        x, y, w, h = rec['bbox']
        results.append(dict(
            preds=kp[None],
            boxes=np.array([[x + w / 2, y + h / 2, w / 200, h / 200,
                             float(w * h), 1.0]]),
            image_paths=[rec['image_file']],
            bbox_ids=[rec['bbox_id']]))
    return results


def test_posetrack_gt_predictions_score_100(tmp_path):
    ds = PoseTrackDataset(ANN, f'{REF}/', test_mode=True, use_gt_bbox=True)
    assert len(ds.db) > 0
    stats = ds.evaluate(_gt_results(ds), res_folder=str(tmp_path))
    assert abs(stats['Total AP'] - 100.0) < 1e-6, stats
    # one json per video sequence was written
    import os
    vids = {im.get('vid_id') for im in ds.coco.imgs.values()}
    written = {f[:-5] for f in os.listdir(tmp_path) if f.endswith('.json')}
    assert written == vids, (written, vids)


def test_posetrack_noisy_predictions_degrade():
    ds = PoseTrackDataset(ANN, f'{REF}/', test_mode=True, use_gt_bbox=True)
    rng = np.random.RandomState(0)
    results = _gt_results(ds)
    for r in results:
        r['preds'] = r['preds'] + rng.randn(*r['preds'].shape) * 60
    stats = ds.evaluate(results)
    assert stats['Total AP'] < 60.0, stats


def test_evaluate_ap_matching_semantics():
    """Greedy PCKh matching: a high-scoring far prediction is a FP, the
    close one a TP; unmatched joints count as FPs."""
    gt = [[dict(joints=np.array([[10, 10, 1]] * 17, np.float32),
                head_size=10.0)]]
    good = np.array([[11, 11, 0.9]] * 17, np.float32)
    bad = np.array([[100, 100, 0.95]] * 17, np.float32)
    preds = [[dict(joints=bad), dict(joints=good)]]
    stats = evaluate_posetrack_ap(gt, preds)
    # per-joint: 2 detections, 1 gt; TP is the lower-scoring one ->
    # AP = precision at recall 1 with envelope = 0.5
    assert abs(stats['Total AP'] - 50.0) < 1e-6, stats

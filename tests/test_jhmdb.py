"""JHMDB PCK/tPCK protocol on the reference fixture."""
import numpy as np

from vitpose_tpu.data import JhmdbDataset

REF = "/root/reference/tests/data/jhmdb"


def _results(ds, noise=0.0, rng=None):
    results = []
    for rec in ds.db:
        kp = rec['joints_3d'].copy()
        if noise:
            kp[:, :2] += rng.randn(ds.num_joints, 2) * noise
        kp[:, 2] = 0.9
        x, y, w, h = rec['bbox']
        results.append(dict(
            preds=kp[None],
            boxes=np.array([[x + w / 2, y + h / 2, w / 200, h / 200,
                             float(w * h), 1.0]]),
            image_paths=[rec['image_file']],
            bbox_ids=[rec['bbox_id']]))
    return results


def test_jhmdb_pck_and_tpck():
    ds = JhmdbDataset(f"{REF}/test_jhmdb_sub1.json", f"{REF}/",
                      test_mode=True, use_gt_bbox=True)
    assert len(ds.db) > 0 and ds.num_joints == 15
    stats = ds.evaluate(_results(ds), metric=['PCK', 'tPCK'])
    for k in ('Head PCK', 'Mean PCK', 'Head tPCK', 'Mean tPCK',
              'Wri PCK', 'Ank tPCK'):
        assert k in stats
    assert stats['Mean PCK'] > 0.99
    assert stats['Mean tPCK'] > 0.99

    rng = np.random.RandomState(0)
    noisy = ds.evaluate(_results(ds, noise=25.0, rng=rng),
                        metric=['PCK', 'tPCK'])
    # torso normalization is much stricter than bbox normalization
    assert noisy['Mean tPCK'] < noisy['Mean PCK'] < 1.0

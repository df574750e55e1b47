"""InterHand2.6M dataset loading + metric tests on the reference fixture."""
import numpy as np
import pytest

REF = "/root/reference/tests/data/interhand2.6m"


@pytest.fixture(scope="module")
def ds():
    from vitpose_tpu.data.interhand import InterHandDataset
    return InterHandDataset(
        f"{REF}/test_interhand2.6m_data.json",
        f"{REF}/test_interhand2.6m_camera.json",
        f"{REF}/test_interhand2.6m_joint_3d.json",
        img_prefix=REF + "/")


def test_interhand_db(ds):
    assert len(ds) > 0
    rec = ds.db[0]
    assert rec['joints_3d'].shape == (42, 3)
    assert rec['hand_type'].shape == (2,)
    # 2D projections land inside the image bounds for visible joints
    vis = rec['joints_3d_visible'][:, 0] > 0
    if vis.any():
        xy = rec['joints_3d'][vis, :2]
        assert xy.min() > -200 and xy.max() < 1200


def test_interhand_perfect_eval(ds):
    preds = []
    ids = []
    for i, rec in enumerate(ds.db):
        cam = rec['joints_cam'].copy()
        cam[:21] -= cam[20]
        cam[21:] -= cam[41]
        preds.append(cam)
        ids.append(i)
    results = [dict(preds=np.stack(preds), bbox_ids=ids,
                    hand_type=np.stack([r['hand_type'] for r in ds.db]))]
    stats = ds.evaluate(results, metric=['MPJPE', 'AUC', 'Handedness_acc'])
    assert stats['MPJPE'] < 1e-4
    assert stats['AUC'] > 0.99
    assert stats['Handedness_acc'] == 1.0


def test_interhand_noisy_auc(ds):
    rng = np.random.RandomState(0)
    preds, ids = [], []
    for i, rec in enumerate(ds.db):
        cam = rec['joints_cam'].copy()
        cam[:21] -= cam[20]
        cam[21:] -= cam[41]
        preds.append(cam + rng.randn(42, 3) * 10)   # 10mm noise
        ids.append(i)
    stats = ds.evaluate([dict(preds=np.stack(preds), bbox_ids=ids)],
                        metric=['MPJPE', 'AUC'])
    assert 10 < stats['MPJPE'] < 30
    assert 0.3 < stats['AUC'] < 0.9


def test_interhand3d_estimator_end_to_end():
    import jax
    import jax.numpy as jnp
    from vitpose_tpu.models.interhand3d import Interhand3DEstimator
    from vitpose_tpu.models.vit import ViTConfig
    bb = ViTConfig(img_size=(64, 64), embed_dim=32, depth=2, num_heads=4)
    est = Interhand3DEstimator(bb, num_joints=42, depth_size=8)
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.normal(rng, (2, 64, 64, 3))
    v = est.init(rng, imgs)
    hm3d, root, htype = est.infer(v, imgs)
    assert hm3d.shape[:3] == (2, 42, 8)
    out = est.decode(hm3d, root, htype,
                     np.array([[100., 100.], [50., 60.]]),
                     np.array([[1.0, 1.0], [0.5, 0.5]]))
    assert out['keypoints_3d'].shape == (2, 42, 3)
    assert out['hand_type'].shape == (2, 2)
    assert np.isfinite(out['keypoints_3d']).all()
    # depths land in the configured mm range
    assert np.abs(out['keypoints_3d'][..., 2]).max() <= 200.0

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


def test_rel_root_depth_target_golden(ds):
    """generate_rel_root_depth_target vs reference
    HandGenerateRelDepthTarget (hand_transform.py:41)."""
    import types
    from ref_loader import _load
    from vitpose_tpu.data.interhand import generate_rel_root_depth_target

    class _Reg:
        def register_module(self, *a, **k):
            return lambda cls: cls

    fb = types.ModuleType('mmpose.datasets.builder')
    fb.PIPELINES = _Reg()
    from ref_loader import ref_top_down_transform
    tdt = ref_top_down_transform()
    pipelines_pkg = types.ModuleType('mmpose.datasets.pipelines')
    pipelines_pkg.__path__ = []
    td_mod = types.ModuleType(
        'mmpose.datasets.pipelines.top_down_transform')
    td_mod.TopDownRandomFlip = tdt.TopDownRandomFlip
    ht = _load(
        '/root/reference/mmpose/datasets/pipelines/hand_transform.py',
        'mmpose.datasets.pipelines.hand_transform_t',
        pre_modules=[
            ('mmpose', types.ModuleType('mmpose')),
            ('mmpose.datasets', types.ModuleType('mmpose.datasets')),
            ('mmpose.datasets.builder', fb),
            ('mmpose.datasets.pipelines', pipelines_pkg),
            ('mmpose.datasets.pipelines.top_down_transform', td_mod)])
    for rel, valid in ((37.5, 1.0), (-410.0, 1.0), (150.0, 0.0),
                       (199.9, 1.0), (203.0, 1.0)):
        ref = ht.HandGenerateRelDepthTarget()(dict(
            rel_root_depth=rel, rel_root_valid=valid,
            ann_info=dict(heatmap_size_root=64, root_depth_bound=400.0)))
        t, w = generate_rel_root_depth_target(rel, valid, 64, 400.0)
        np.testing.assert_allclose(t, ref['target'], rtol=1e-6)
        np.testing.assert_allclose(w, ref['target_weight'], rtol=1e-6)


def test_training_targets_and_losses(ds):
    """Dataset record -> training target group -> interhand3d_losses is
    finite and near zero for a perfect prediction."""
    import jax.numpy as jnp
    from vitpose_tpu.data.interhand import training_targets
    from vitpose_tpu.models.interhand3d import interhand3d_losses

    rec = ds.db[0]
    tg = training_targets(rec, heatmap_size=(16, 16, 16),
                          root_depth_bins=16, sigma=2.0)
    k = rec['joints_3d'].shape[0]
    assert tg['hm3d'].shape == (k, 16, 16, 16)
    assert tg['hm_weight'].shape == (k, 1)
    assert tg['hand_type'].shape == (2,)

    B = 16
    root_logits = np.full((1, B), -30.0, np.float32)
    bin_idx = int(np.clip(round(float(tg['rel_root_target'][0])), 0, B - 1))
    root_logits[0, bin_idx] = 30.0
    type_logits = np.where(tg['hand_type'] > 0.5, 20.0, -20.0)[None]
    losses = interhand3d_losses(
        (jnp.asarray(tg['hm3d'][None]), jnp.asarray(root_logits),
         jnp.asarray(type_logits)),
        tg['hm3d'][None], tg['hm_weight'][None, :, 0],
        tg['rel_root_depth_mm'], tg['rel_root_weight'][0] * np.ones(1),
        tg['hand_type'][None], tg['hand_type_weight'],
        root_depth_bins=B, root_depth_range_mm=400.0)
    assert float(losses['hand_loss']) < 1e-8
    assert float(losses['rel_root_loss']) < 0.6
    assert float(losses['hand_type_loss']) < 1e-6


def test_interhand3d_cnn_trunk_train_apply():
    """The res50-style CNN trunk (build_family_model 'interhand3d') must
    run a training forward that advances BatchNorm stats and feed
    interhand3d_losses."""
    import jax
    import jax.numpy as jnp
    from vitpose_tpu.train.loop import build_family_model
    from vitpose_tpu.models.interhand3d import interhand3d_losses

    model = build_family_model('interhand3d', dict(
        backbone_type='resnet', backbone_overrides=dict(depth=18),
        num_joints=6, depth_size=8))
    imgs = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), imgs)
    out, new_vars = model.train_apply(variables, imgs)
    hm3d, root_logits, type_logits = out
    assert hm3d.shape[:3] == (2, 6, 8)
    # BN stats advanced somewhere in backbone or head
    assert 'batch_stats' in new_vars['backbone']
    # apply(train=True) works too (stat updates discarded by contract)
    out2 = model.apply(variables, imgs, train=True)
    assert out2[0].shape == hm3d.shape

    losses = interhand3d_losses(
        out, np.zeros(hm3d.shape, np.float32), np.ones((2, 6)),
        np.zeros(2), np.ones(2), np.ones((2, 2)), np.ones(2),
        root_depth_bins=root_logits.shape[-1])
    assert all(np.isfinite(float(v)) for v in losses.values())


def test_train_interhand3d_model_smoke():
    """tools/train.py path for the interhand3d family: a few steps on the
    reference fixture annotations run, update params, and produce finite
    decreasing-capable losses."""
    from vitpose_tpu.train.loop import train_model

    cfg = dict(
        model=dict(family='interhand3d', backbone_type='resnet',
                   backbone_overrides=dict(depth=18), num_joints=42,
                   depth_size=8),
        data=dict(
            dataset='interhand3d', image_size=(64, 64),
            heatmap_size=(8, 8), batch_size=2,
            train=dict(
                ann_file=f"{REF}/test_interhand2.6m_data.json",
                camera_file=f"{REF}/test_interhand2.6m_camera.json",
                joint_file=f"{REF}/test_interhand2.6m_joint_3d.json",
                img_prefix=REF + "/")),
        target=dict(depth_bound=400.0, root_depth_bins=16,
                    root_depth_bound=400.0, sigma=1.5),
        optimizer=dict(base_lr=1e-3, total_epochs=2),
    )
    variables, metrics = train_model(cfg, max_steps=3)
    assert set(metrics) >= {'hand_loss', 'rel_root_loss',
                            'hand_type_loss', 'total_loss'}
    assert all(np.isfinite(v) for v in metrics.values())
    assert 'params' in variables['backbone']


def test_interhand3d_eval_cli(tmp_path):
    """tools/test.py family dispatch for interhand3d: train 2 steps ->
    final.npz -> CLI eval produces finite MPJPE/AUC/Handedness_acc."""
    import importlib.util
    import json
    import os
    import sys
    from vitpose_tpu.train.loop import train_model

    wd = str(tmp_path)
    tri = dict(ann_file=f"{REF}/test_interhand2.6m_data.json",
               camera_file=f"{REF}/test_interhand2.6m_camera.json",
               joint_file=f"{REF}/test_interhand2.6m_joint_3d.json",
               img_prefix=REF + "/")
    cfgd = dict(
        model=dict(family='interhand3d', backbone_type='resnet',
                   backbone_overrides=dict(depth=18), num_joints=42,
                   depth_size=8),
        data=dict(dataset='interhand3d', image_size=(64, 64),
                  heatmap_size=(8, 8), batch_size=2,
                  train=dict(tri), val=dict(tri)),
        target=dict(root_depth_bins=16, sigma=1.5),
        optimizer=dict(base_lr=1e-3, total_epochs=1),
        runtime=dict(work_dir=wd))
    train_model(cfgd, max_steps=2)
    cfg_path = os.path.join(wd, 'cfg.py')
    with open(cfg_path, 'w') as f:
        for k, v in cfgd.items():
            f.write(f"{k} = {v!r}\n")
    spec = importlib.util.spec_from_file_location(
        '_test_cli_ih', '/root/repo/tools/test.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = ['tools/test.py', cfg_path, os.path.join(wd, 'final.npz'),
                '--out', os.path.join(wd, 'stats.json'),
                '--metric', 'MPJPE', 'AUC', 'Handedness_acc']
    try:
        mod.main()
    finally:
        sys.argv = old
    stats = json.load(open(os.path.join(wd, 'stats.json')))
    assert set(stats) == {'MPJPE', 'AUC', 'Handedness_acc'}
    assert all(np.isfinite(v) for v in stats.values())


def test_hand_random_flip_in_loader(ds):
    """HandRandomFlip semantics in the training loader (reference
    hand_transform.py:9): joint blocks swapped via flip_index, hand_type
    reversed, rel_root_depth negated; translation/scale/rot jitter applied
    (reference res50_interhand3d_all_256x256.py:77-83)."""
    from vitpose_tpu.train.interhand_loop import InterHandLoader

    loader = InterHandLoader(ds, batch_size=2, image_size=(64, 64),
                             heatmap_size=(16, 16, 16), is_train=True)
    rec = ds.db[0]

    class ForceFlip:
        """rand() low first (forces flip), then neutral jitter."""
        def __init__(self):
            self.calls = 0

        def rand(self):
            self.calls += 1
            return 0.0 if self.calls == 1 else 1.0   # flip; no rotation

        def uniform(self, a, b, n):
            return np.zeros(n)

        def randn(self):
            return 0.0

    crop, tg = loader._prepare(rec, ForceFlip())
    crop0, tg0 = loader._prepare(rec, None)
    np.testing.assert_allclose(tg['hand_type'],
                               np.asarray(rec['hand_type'])[::-1])
    assert tg['rel_root_depth_mm'][0] == -rec['rel_root_depth']
    assert np.isfinite(tg['hm3d']).all() and np.isfinite(crop).all()
    # eval-mode prepare is untouched by augmentation
    np.testing.assert_allclose(tg0['hand_type'], rec['hand_type'])


def test_interhand_mrrpe_tracks_predictions(ds):
    """MRRPE follows the reference protocol (interhand3d_dataset.py:
    404-431): perfect pixel predictions + true rel_root_depth -> ~0;
    perturbing the predicted rel_root_depth strictly increases it (the
    previous formulation was prediction-independent)."""
    from vitpose_tpu.data.interhand import R_WRIST, L_WRIST

    def project(cam, focal, princpt):
        z = cam[:, 2]
        return np.stack([cam[:, 0] / z * focal[0] + princpt[0],
                         cam[:, 1] / z * focal[1] + princpt[1]], axis=1)

    def build(results_depth_offset):
        preds, px_list, rr, ids = [], [], [], []
        for rec in ds.db:
            cam = rec['joints_cam'].copy()
            pix = project(cam, rec['focal'], rec['princpt'])
            z_rel = cam[:, 2].copy()
            z_rel[:21] -= cam[R_WRIST, 2]
            z_rel[21:] -= cam[L_WRIST, 2]
            px = np.concatenate([pix, z_rel[:, None]], axis=1)
            rel = rec['rel_root_depth'] + results_depth_offset
            cam_rel = cam.copy()
            cam_rel[:21] -= cam[R_WRIST]
            cam_rel[21:] -= cam[L_WRIST]
            preds.append(cam_rel)
            px_list.append(px)
            rr.append(rel)
            ids.append(rec['bbox_id'])
        return [dict(preds=np.stack(preds), bbox_ids=ids,
                     keypoints_px=np.stack(px_list),
                     rel_root_depth=np.asarray(rr))]

    s0 = ds.evaluate(build(0.0), metric=['MRRPE'])
    s1 = ds.evaluate(build(25.0), metric=['MRRPE'])
    if s0['MRRPE'] < 0:       # fixture has no interacting two-hand sample
        import pytest
        pytest.skip('no interacting sample in fixture')
    assert s0['MRRPE'] < 1e-3, s0
    assert s1['MRRPE'] > 20.0, s1
    # MRRPE without the pixel predictions is a protocol error, not a
    # silently-constant number
    import pytest
    with pytest.raises(KeyError):
        ds.evaluate([dict(preds=np.zeros((len(ds.db), 42, 3)),
                          bbox_ids=[r['bbox_id'] for r in ds.db])],
                    metric=['MRRPE'])


def test_rel_root_depth_soft_argmax_decode():
    """decode() uses the reference soft-argmax over depth bins
    (Heatmap1DHead.soft_argmax_1d, interhand_3d_head.py:209) — mass split
    across adjacent bins interpolates instead of snapping to a bin."""
    import jax.numpy as jnp
    from vitpose_tpu.models.interhand3d import Interhand3DEstimator

    est = Interhand3DEstimator.__new__(Interhand3DEstimator)
    est.depth_size = 16
    est.depth_range = 400.0
    est.root_depth_range = 400.0
    bins = 64
    logits = np.full((2, bins), -30.0, np.float32)
    logits[0, 40] = 5.0                         # one-hot at bin 40
    logits[1, 40] = 5.0
    logits[1, 41] = 5.0                         # split 40/41 -> 40.5
    hm3d = np.zeros((2, 1, 4, 4, 4), np.float32)
    hm3d[:, 0, 2, 2, 2] = 1.0
    type_logits = np.zeros((2, 2), np.float32)
    dec = est.decode(hm3d, jnp.asarray(logits), type_logits,
                     np.zeros((2, 2), np.float32),
                     np.ones((2, 2), np.float32))
    r0, r1 = dec['rel_root_depth']
    step = 400.0 / bins
    assert abs(r0 - ((40 / bins) - 0.5) * 400.0) < 1e-3
    assert abs(r1 - r0 - step / 2) < 1e-3       # half-bin interpolation

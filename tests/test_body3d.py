"""H36M 3D dataset + MPJPE metrics + PoseLifter training smoke."""
import numpy as np
import pytest

REF = "/root/reference/tests/data/h36m"


def test_h36m_dataset_sequences():
    from vitpose_tpu.data.body3d import Body3DH36MDataset
    ds = Body3DH36MDataset(f"{REF}/test_h36m_body3d.npz", seq_len=3)
    assert len(ds) == 4
    s = ds[0]
    assert s['input_2d'].shape == (3, 17, 2)
    assert s['target_3d'].shape == (17, 3)


def test_h36m_2d_detection_substitution():
    from vitpose_tpu.data.body3d import Body3DH36MDataset
    ds = Body3DH36MDataset(f"{REF}/test_h36m_body3d.npz", seq_len=1,
                           det_file=f"{REF}/test_h36m_2d_detection.npy")
    s = ds[0]
    assert s['input_2d'].shape == (1, 17, 2)


def test_mpjpe_metrics():
    from vitpose_tpu.data.body3d import keypoint_mpjpe, procrustes_align
    rng = np.random.RandomState(0)
    gt = rng.randn(4, 17, 3)
    mask = np.ones((4, 17), bool)
    # pure translation: mpjpe > 0, p-mpjpe == 0
    pred = gt + np.array([0.5, 0.0, 0.0])
    assert keypoint_mpjpe(pred, gt, mask) == pytest.approx(0.5, abs=1e-6)
    assert keypoint_mpjpe(pred, gt, mask, 'procrustes') < 1e-6
    # pure scale: n-mpjpe == 0
    pred = gt * 1.3
    assert keypoint_mpjpe(pred, gt, mask, 'scale') < 1e-6
    # procrustes recovers a random rotation
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    pred = gt @ q.T * 0.8 + 2.0
    assert keypoint_mpjpe(pred, gt, mask, 'procrustes') < 1e-6


def test_h36m_evaluate():
    from vitpose_tpu.data.body3d import Body3DH36MDataset
    ds = Body3DH36MDataset(f"{REF}/test_h36m_body3d.npz", seq_len=1)
    preds = np.stack([ds.joints_3d[i][..., :3] for i in range(4)])
    results = [dict(preds=preds, target_idxs=[0, 1, 2, 3])]
    stats = ds.evaluate(results, metric=['mpjpe', 'p-mpjpe', 'n-mpjpe'])
    assert stats['MPJPE'] < 1e-6


@pytest.mark.slow
def test_poselifter_training_on_h36m():
    """PoseLifter overfits the 4-sample H36M fixture (loss + MPJPE drop)."""
    import jax
    import jax.numpy as jnp
    import optax
    from vitpose_tpu.data.body3d import Body3DH36MDataset, keypoint_mpjpe
    from vitpose_tpu.models.pose3d import PoseLifter
    from vitpose_tpu.models.losses_regression import mpjpe_loss

    ds = Body3DH36MDataset(f"{REF}/test_h36m_body3d.npz", seq_len=9)
    model = PoseLifter(num_joints=17, stem_channels=64,
                       kernel_sizes=(3, 3))
    x = jnp.stack([jnp.asarray(ds[i]['input_2d']) for i in range(4)])
    x = x / 1000.0
    y = jnp.stack([jnp.asarray(ds[i]['target_3d']) for i in range(4)])
    root = y[:, :1]
    y_rel = y - root
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, x, train=False)
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables)

    @jax.jit
    def step(variables, opt_state):
        def loss_fn(v):
            out = model.apply(v, x, train=False)
            return mpjpe_loss(out, y_rel)
        loss, grads = jax.value_and_grad(loss_fn)(variables)
        updates, opt_state2 = tx.update(grads, opt_state, variables)
        return optax.apply_updates(variables, updates), opt_state2, loss

    losses = []
    for _ in range(150):
        variables, opt_state, loss = step(variables, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.2, (losses[0], losses[-1])
    out = model.apply(variables, x, train=False)
    err = keypoint_mpjpe(np.asarray(out), np.asarray(y_rel),
                         np.ones((4, 17), bool))
    assert err < losses[0]


def test_inference_pose_lifter_api():
    """API-level 2D->3D lifting: windowed sequence extraction + per-person
    lifting with track-id matching (reference apis/inference_3d.py:212)."""
    import numpy as np
    import jax
    from vitpose_tpu.api.inference_3d import (extract_pose_sequence,
                                              inference_pose_lifter_model)
    from vitpose_tpu.models.pose3d import PoseLifter

    model = PoseLifter(num_joints=17, stem_channels=64,
                       kernel_sizes=(3, 3))
    t_len = model.receptive_field
    rng = np.random.RandomState(0)

    def frame(t):
        return [dict(track_id=0, bbox=[10.0, 20.0, 210.0, 420.0],
                     keypoints=rng.rand(17, 3).astype(np.float32) * 100),
                dict(track_id=1, bbox=[300.0, 40.0, 500.0, 440.0],
                     keypoints=rng.rand(17, 3).astype(np.float32) * 100)]

    frames = [frame(t) for t in range(40)]
    # padded window at the sequence start
    seq = extract_pose_sequence(frames, frame_idx=0, causal=False,
                                seq_len=t_len)
    assert len(seq) == t_len

    import jax.numpy as jnp
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, t_len, 17, 2)), train=False)
    results = inference_pose_lifter_model(model, variables, seq,
                                          image_size=(640, 480),
                                          norm_pose_2d=True)
    assert len(results) == 2
    for r in results:
        assert r['keypoints_3d'].shape[-1] == 3
        assert np.isfinite(r['keypoints_3d']).all()
    # norm_pose_2d actually changes the inputs (reference
    # inference_3d.py:104-110 bbox renormalization), so outputs differ
    # from the un-normalized call — and the bbox is required
    plain = inference_pose_lifter_model(model, variables, seq,
                                        image_size=(640, 480))
    assert not np.allclose(results[0]['keypoints_3d'],
                           plain[0]['keypoints_3d'])
    import pytest
    bare = [[{k: v for k, v in p.items() if k != 'bbox'} for p in f]
            for f in seq]
    with pytest.raises(KeyError):
        inference_pose_lifter_model(model, variables, bare,
                                    image_size=(640, 480),
                                    norm_pose_2d=True)


def test_train_pose_lifter_model_from_config():
    """tools/train.py path for the pose_lifter family: config-driven TCN
    steps on the H36M fixture; loss finite, work_dir persisted."""
    import tempfile, os, json
    from vitpose_tpu.train.loop import train_model

    with tempfile.TemporaryDirectory() as wd:
        cfg = dict(
            model=dict(family='pose_lifter', num_joints=17,
                       stem_channels=32, kernel_sizes=(3, 3)),
            data=dict(dataset='h36m', seq_len=9, batch_size=2,
                      train=dict(ann_file=f"{REF}/test_h36m_body3d.npz")),
            optimizer=dict(base_lr=1e-3, lr_decay=0.975, total_epochs=1),
            runtime=dict(work_dir=wd))
        variables, metrics = train_model(cfg, max_steps=2)
        assert np.isfinite(metrics['mpjpe_loss'])
        assert os.path.exists(os.path.join(wd, 'final.npz'))
        line = json.loads(open(os.path.join(wd,
                                            'train.log.json')).readline())
        assert line['step'] == 2


def test_pose_lifter_eval_cli(tmp_path):
    """tools/test.py family dispatch for pose_lifter: train 2 steps ->
    final.npz -> CLI eval runs the H36M MPJPE protocol
    (reference tools/test.py + body3d_h36m_dataset.evaluate)."""
    import importlib.util
    import json
    import os
    import sys
    from vitpose_tpu.train.loop import train_model

    wd = str(tmp_path)
    cfgd = dict(
        model=dict(family='pose_lifter', num_joints=17,
                   stem_channels=32, kernel_sizes=(3, 3)),
        data=dict(dataset='h36m', seq_len=9, batch_size=2,
                  train=dict(ann_file=f"{REF}/test_h36m_body3d.npz"),
                  val=dict(ann_file=f"{REF}/test_h36m_body3d.npz")),
        optimizer=dict(base_lr=1e-3, lr_decay=0.975, total_epochs=1),
        runtime=dict(work_dir=wd))
    train_model(cfgd, max_steps=2)
    cfg_path = os.path.join(wd, 'cfg.py')
    with open(cfg_path, 'w') as f:
        for k, v in cfgd.items():
            f.write(f"{k} = {v!r}\n")
    spec = importlib.util.spec_from_file_location(
        '_test_cli_pl', '/root/repo/tools/test.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = ['tools/test.py', cfg_path, os.path.join(wd, 'final.npz'),
                '--out', os.path.join(wd, 'stats.json'),
                '--metric', 'mpjpe', 'p-mpjpe', 'n-mpjpe']
    try:
        mod.main()
    finally:
        sys.argv = old
    stats = json.load(open(os.path.join(wd, 'stats.json')))
    assert set(stats) == {'MPJPE', 'P-MPJPE', 'N-MPJPE'}
    assert all(np.isfinite(v) for v in stats.values())


def test_pose_lifter_in_loop_validation(tmp_path):
    """`evaluation = dict(interval=1)` runs the H36M MPJPE protocol at
    epoch end and appends a mode='val' line to train.log.json (EvalHook
    parity for the pose_lifter family)."""
    import json
    import os
    from vitpose_tpu.train.loop import train_model

    wd = str(tmp_path)
    cfg = dict(
        model=dict(family='pose_lifter', num_joints=17,
                   stem_channels=32, kernel_sizes=(3, 3)),
        data=dict(dataset='h36m', seq_len=9, batch_size=2,
                  train=dict(ann_file=f"{REF}/test_h36m_body3d.npz"),
                  val=dict(ann_file=f"{REF}/test_h36m_body3d.npz")),
        optimizer=dict(base_lr=1e-3, lr_decay=0.975, total_epochs=1),
        evaluation=dict(interval=1, metric=['mpjpe', 'p-mpjpe']),
        runtime=dict(work_dir=wd, save_best='MPJPE'))
    # no explicit save_best_mode: MPJPE must be inferred less-is-better
    # (reference MMPOSE_LESS_KEYS)
    train_model(cfg)
    lines = [json.loads(l) for l in
             open(os.path.join(wd, 'train.log.json'))]
    val = [l for l in lines if l.get('mode') == 'val']
    assert len(val) == 1 and val[0]['epoch'] == 1
    assert np.isfinite(val[0]['MPJPE']) and np.isfinite(val[0]['P-MPJPE'])
    # save_best tracked the MPJPE metric into best.npz
    assert os.path.exists(os.path.join(wd, 'best.npz'))


def test_simplebaseline3d_protocol(tmp_path):
    """SimpleBaseline3D config path: root-removed 16-joint targets with
    mean/std NormalizeJointCoordinate (from stats pkl), MSE loss, eval
    un-normalizes + reinserts the root (reference simplebaseline3d_h36m.py
    + pose3d_transform.py:61 NormalizeJointCoordinate)."""
    import json
    import pickle
    import tempfile
    from vitpose_tpu.data.body3d import Body3DH36MDataset
    from vitpose_tpu.train.loop import train_model, build_model_from_cfg
    from vitpose_tpu.eval.families import evaluate_pose_lifter

    h36m = f"{REF}/test_h36m_body3d.npz"
    ds = Body3DH36MDataset(h36m, seq_len=1, causal=True)
    # build the stats pkls the reference quotes, from the fixture itself
    rel = ds.joints_3d[:, :, :3] - ds.joints_3d[:, :1, :3]
    rel = rel[:, 1:]
    p3d = tmp_path / "joint3d_rel_stats.pkl"
    with open(p3d, "wb") as f:
        pickle.dump({"mean": rel.mean(0), "std": rel.std(0) + 1e-3}, f)
    p2d = tmp_path / "joint2d_stats.pkl"
    with open(p2d, "wb") as f:
        pickle.dump({"mean": ds.joints_2d[..., :2].mean(0),
                     "std": ds.joints_2d[..., :2].std(0) + 1e-3}, f)

    wd = str(tmp_path / "wd")
    cfg = dict(
        model=dict(family='pose_lifter', num_joints=16, stem_channels=32,
                   kernel_sizes=(1, 1), dropout=0.5, remove_root=True,
                   loss='mse'),
        joint_3d_normalize=dict(stats_file=str(p3d)),
        joint_2d_normalize=dict(stats_file=str(p2d)),
        data=dict(dataset='h36m', seq_len=1, causal=True, batch_size=2,
                  flip_aug=False,
                  train=dict(ann_file=h36m), val=dict(ann_file=h36m)),
        optimizer=dict(base_lr=1e-3, lr_decay=0.975, total_epochs=1),
        runtime=dict(work_dir=wd))
    variables, metrics = train_model(cfg, max_steps=3)
    assert np.isfinite(metrics['mpjpe_loss'])

    model = build_model_from_cfg(cfg['model'])
    stats = evaluate_pose_lifter(cfg, model, variables,
                                 metric=['mpjpe', 'p-mpjpe'])
    assert all(np.isfinite(v) for v in stats.values()), stats

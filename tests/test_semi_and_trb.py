"""MPII-TRB dataset protocol + VideoPose3D semi-supervised lifting.

Goldens:
  * MpiiTrbDataset db conventions and headbox-PCKh evaluate vs the
    reference protocol (topdown_mpii_trb_dataset.py:113-300).
  * semi_supervision_loss (projection + bone) vs the reference torch
    SemiSupervisionLoss (regression_loss.py:360-449).
"""
import copy
import json

import numpy as np
import pytest

REF = "/root/reference"
TRB_JSON = f"{REF}/tests/data/mpii/test_mpii_trb.json"
TRB_PREFIX = f"{REF}/tests/data/mpii/"


def _trb_fixture_with_headboxes(tmp_path):
    with open(TRB_JSON) as f:
        data = json.load(f)
    rng = np.random.RandomState(5)
    for ann in data["annotations"]:
        c = np.asarray(ann["center"], np.float32)
        ann["headbox"] = [float(c[0] - 40), float(c[1] - 60),
                         float(c[0] + 40 + rng.rand() * 20),
                         float(c[1] - 20 + rng.rand() * 10)]
    p = tmp_path / "trb_headbox.json"
    p.write_text(json.dumps(data))
    return str(p), data


def test_trb_db_conventions(tmp_path):
    """center as-is, scale = image_size/s/200, bbox_id = ann id, sorted,
    all-zero-keypoint annotations skipped."""
    from vitpose_tpu.data.mpii import MpiiTrbDataset

    ann_file, data = _trb_fixture_with_headboxes(tmp_path)
    ds = MpiiTrbDataset(ann_file, TRB_PREFIX, image_size=(256, 256),
                        heatmap_size=(64, 64), test_mode=True)
    kept = [a for a in data["annotations"] if max(a["keypoints"]) > 0]
    assert len(ds.db) == len(kept)
    ids = [r["bbox_id"] for r in ds.db]
    assert ids == sorted(ids)
    by_id = {a["id"]: a for a in kept}
    for rec in ds.db:
        a = by_id[rec["bbox_id"]]
        np.testing.assert_allclose(rec["center"], a["center"])
        np.testing.assert_allclose(
            rec["scale"], np.array([256.0, 256.0]) / a["scale"] / 200.0,
            rtol=1e-6)
        assert rec["headbox"].shape == (4,)


def test_trb_evaluate_matches_reference_kernel(tmp_path):
    """Our evaluate == an independent replica of the reference headbox
    PCKh kernel (threshold 0.3 * headbox diagonal, skeleton/contour
    split; topdown_mpii_trb_dataset.py:168-300)."""
    from vitpose_tpu.data.mpii import MpiiTrbDataset

    ann_file, _ = _trb_fixture_with_headboxes(tmp_path)
    ds = MpiiTrbDataset(ann_file, TRB_PREFIX, test_mode=True)
    rng = np.random.RandomState(7)
    results = []
    for rec in ds.db:
        kp = np.zeros((ds.num_joints, 3), np.float32)
        kp[:, :2] = rec["joints_3d"][:, :2] + rng.randn(ds.num_joints, 2) * 25
        results.append(dict(preds=kp[None],
                            boxes=np.zeros((1, 6), np.float32),
                            image_paths=[rec["image_file"]],
                            bbox_ids=[rec["bbox_id"]]))
    stats = ds.evaluate(results, metric="PCKh")

    num = ds.num_joints
    hit = np.zeros(num)
    exist = np.zeros(num)
    for rec, r in zip(ds.db, results):
        headbox = np.array(rec["headbox"])
        threshold = np.linalg.norm(headbox[:2] - headbox[2:]) * 0.3
        for i in range(num):
            if not rec["joints_3d_visible"][i][0]:
                continue
            exist[i] += 1
            d = np.linalg.norm(r["preds"][0][i, :2] -
                               rec["joints_3d"][i, :2])
            if d < threshold:
                hit[i] += 1
    assert stats["Skeleton_acc"] == pytest.approx(
        np.sum(hit[:14]) / np.sum(exist[:14]))
    assert stats["Contour_acc"] == pytest.approx(
        np.sum(hit[14:]) / np.sum(exist[14:]))
    assert stats["PCKh"] == pytest.approx(np.sum(hit) / np.sum(exist))
    assert 0.0 < stats["PCKh"] < 1.0  # noise keeps it off both rails


def test_semi_supervision_loss_golden():
    """proj_loss/bone_loss match the reference torch SemiSupervisionLoss
    for both 4- and 9-parameter (distortion) intrinsics."""
    import torch
    from test_losses import _load_losses
    from vitpose_tpu.models.losses_regression import semi_supervision_loss

    mod = _load_losses("regression_loss.py", "_ref_reg")
    parents = [0, 0, 1, 2, 0, 4, 5, 0, 7, 8, 8, 10, 11, 8, 13, 14, 0]
    rng = np.random.RandomState(11)
    n, k = 6, 17
    labeled = rng.randn(n, k, 3).astype(np.float32)
    unlabeled = rng.randn(n, k, 3).astype(np.float32)
    traj = rng.randn(n, 1, 3).astype(np.float32) + np.array([0, 0, 4.0],
                                                            np.float32)
    target2d = rng.rand(n, k, 2).astype(np.float32) * 200
    for n_intr in (4, 9):
        intr = np.concatenate(
            [np.full((n, 2), 500.0), np.full((n, 2), 100.0),
             rng.randn(n, 5) * 0.01], axis=1)[:, :n_intr].astype(np.float32)
        crit = mod.SemiSupervisionLoss(joint_parents=parents,
                                       warmup_iterations=0)
        ref = crit(
            dict(labeled_pose=torch.from_numpy(labeled),
                 unlabeled_pose=torch.from_numpy(unlabeled),
                 unlabeled_traj=torch.from_numpy(traj)),
            dict(unlabeled_target_2d=torch.from_numpy(target2d),
                 intrinsics=torch.from_numpy(intr.copy())))
        got = semi_supervision_loss(labeled, unlabeled, traj, target2d,
                                    intr, parents)
        assert float(got["proj_loss"]) == pytest.approx(
            float(ref["proj_loss"]), rel=1e-4)
        assert float(got["bone_loss"]) == pytest.approx(
            float(ref["bone_loss"]), rel=1e-4)


def test_semi_supervised_lifter_training():
    """PoseLifter(with_traj) + labeled MPJPE + semi losses through the
    Body3DSemiSupervisionDataset wrapper: one jitted step runs and the
    combined loss decreases."""
    import jax
    import jax.numpy as jnp
    import optax
    from vitpose_tpu.data.body3d import (Body3DH36MDataset,
                                         Body3DSemiSupervisionDataset)
    from vitpose_tpu.models.pose3d import PoseLifter
    from vitpose_tpu.models.losses_regression import (mpjpe_loss,
                                                      semi_supervision_loss)

    h36m = f"{REF}/tests/data/h36m/test_h36m_body3d.npz"
    labeled = Body3DH36MDataset(h36m, seq_len=9)
    semi = Body3DSemiSupervisionDataset(labeled, labeled, seed=3)
    items = [semi[i] for i in range(len(semi))]
    x = jnp.stack([jnp.asarray(d["input_2d"]) for d in items]) / 1000.0
    xu = jnp.stack([jnp.asarray(d["unlabeled_input_2d"])
                    for d in items]) / 1000.0
    y = jnp.stack([jnp.asarray(d["target_3d"]) for d in items])
    y_rel = y - y[:, :1]
    # unlabeled 2D target = the observed detections at the target frame
    t2d = xu[:, xu.shape[1] // 2] * 1000.0
    n = x.shape[0]
    intr = jnp.tile(jnp.asarray([[500.0, 500.0, 100.0, 100.0]]), (n, 1))
    parents = [0, 0, 1, 2, 0, 4, 5, 0, 7, 8, 8, 10, 11, 8, 13, 14, 0]

    model = PoseLifter(num_joints=17, stem_channels=32, kernel_sizes=(3, 3),
                       with_traj=True)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables)

    @jax.jit
    def step(variables, opt_state):
        def loss_fn(v):
            pose, _ = model.apply(v, x, train=False)
            upose, utraj = model.apply(v, xu, train=False)
            # camera-space depth offset: the head initializes near 0 and
            # projection x/z is singular at z=0 (real trajectories are
            # meters from the camera)
            utraj = utraj + jnp.asarray([0.0, 0.0, 4.0])
            semi_l = semi_supervision_loss(pose, upose, utraj, t2d, intr,
                                           parents, warmup=1.0)
            return (mpjpe_loss(pose, y_rel) + 0.01 * semi_l["proj_loss"]
                    + semi_l["bone_loss"])
        loss, grads = jax.value_and_grad(loss_fn)(variables)
        updates, opt_state2 = tx.update(grads, opt_state, variables)
        return optax.apply_updates(variables, updates), opt_state2, loss

    losses = []
    for _ in range(40):
        variables, opt_state, loss = step(variables, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], (losses[0], losses[-1])


def test_projection_safe_at_zero_depth():
    """project_joints must not leak NaN gradients when the (untrained)
    trajectory root depth is ~0 — the warmup gate multiplies the loss by
    0, and 0 * inf would still be NaN (review finding)."""
    import jax
    import jax.numpy as jnp
    from vitpose_tpu.models.losses_regression import (project_joints,
                                                      semi_supervision_loss)

    intr = jnp.tile(jnp.array([[1000., 1000., 500., 500.]]), (1, 1))

    def f(x):
        d = semi_supervision_loss(
            x * 0.0 + 0.1, x * 0.0 + 0.1, x,  # traj carries the zero depth
            jnp.zeros((1, 3, 2)), intr,
            np.array([0, 0, 1]), warmup=0.0)
        return d['proj_loss'] + d['bone_loss']

    x0 = jnp.zeros((1, 1, 3))                     # root depth exactly 0
    g = jax.grad(f)(x0)
    assert np.isfinite(np.asarray(g)).all()
    assert float(f(x0)) == 0.0                    # warmup gate active
    p = project_joints(jnp.zeros((2, 3, 3)), jnp.tile(intr, (2, 1)))
    assert np.isfinite(np.asarray(p)).all()


def test_semi_supervision_pairing_changes_per_epoch():
    from vitpose_tpu.data.body3d import Body3DSemiSupervisionDataset

    class Toy:
        def __init__(self, tag, n):
            self.tag, self.n = tag, n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return {'idx': i, 'tag': self.tag}

    ds = Body3DSemiSupervisionDataset(Toy('lab', 50), Toy('unl', 8), seed=3)
    first = [ds[i]['idx'] for i in range(8)]
    assert [ds[i]['idx'] for i in range(8)] == first  # deterministic
    ds.set_epoch(1)
    assert [ds[i]['idx'] for i in range(8)] != first  # re-drawn per epoch


def test_lifter_input_protocol_golden():
    """flip_relative_pose == reference fliplr_regression (static + root
    centers) and normalize_screen_coordinates == reference
    ImageCoordinateNormalization math (pose3d_transform.py:158-165)."""
    from ref_loader import ref_post_transforms
    from vitpose_tpu.data.body3d import (flip_relative_pose,
                                         normalize_screen_coordinates)

    pt = ref_post_transforms()
    rng = np.random.RandomState(7)
    pairs = [[1, 4], [2, 5], [3, 6], [11, 14], [12, 15], [13, 16]]
    x = rng.randn(9, 17, 2).astype(np.float32)     # [T, K, 2] sequence
    ref = pt.fliplr_regression(x.copy(), pairs, center_mode='static',
                               center_x=0.0)
    got = flip_relative_pose(x, pairs)
    np.testing.assert_allclose(got, ref, rtol=1e-6)
    y = rng.randn(17, 3).astype(np.float32)
    y -= y[:1]                                     # root-centered
    ref3 = pt.fliplr_regression(y.copy(), pairs, center_mode='root',
                                center_index=0)
    got3 = flip_relative_pose(y, pairs)            # root x = 0 -> static 0
    np.testing.assert_allclose(got3, ref3, rtol=1e-6, atol=1e-6)

    pts = rng.rand(17, 2).astype(np.float32) * 1000
    w, h = 1000.0, 1002.0
    center = np.array([0.5 * w, 0.5 * h], np.float32)
    ref_n = (pts - center) / np.float32(0.5 * w)
    np.testing.assert_allclose(normalize_screen_coordinates(pts, w, h),
                               ref_n, rtol=1e-6)


def test_h36m_camera_params_loaded():
    """cameras.pkl -> per-frame sensor size + normalized intrinsics (the
    reference ImageCoordinateNormalization(norm_camera=True) +
    CollectCameraIntrinsics contract)."""
    from vitpose_tpu.data.body3d import Body3DH36MDataset

    ds = Body3DH36MDataset(
        f"{REF}/tests/data/h36m/test_h36m_body3d.npz", seq_len=1,
        camera_param_file=f"{REF}/tests/data/h36m/cameras.pkl")
    assert ds.cam_intr is not None and ds.cam_intr.shape[1] == 9
    # fixture cameras are 1000x1002 or 1000x1000
    assert (ds.cam_wh[:, 0] == 1000).all()
    intr = ds.normalized_intrinsics(0)
    # f normalized by w/2 -> ~2.2, c -> ~0
    assert 1.5 < intr[0] < 3.0 and abs(intr[2]) < 0.1
    # normalize_2d maps the sensor to [-1, 1]
    pts = np.array([[0.0, 0.0], [1000.0, 1002.0]], np.float32)
    n = ds.normalize_2d(pts, 0)
    np.testing.assert_allclose(n[0], [-1.0, -ds.cam_wh[0, 1] / 1000.0],
                               rtol=1e-5)


def test_train_semi_supervised_lifter_from_config():
    """tools/train.py path for the semi-supervised pose_lifter family:
    with_traj model + labeled MPJPE + traj MPJPE + warmup-gated
    projection/bone losses, driven purely by the config dict."""
    import tempfile
    import os
    from vitpose_tpu.train.loop import train_model

    h36m = f"{REF}/tests/data/h36m/test_h36m_body3d.npz"
    cams = f"{REF}/tests/data/h36m/cameras.pkl"
    with tempfile.TemporaryDirectory() as wd:
        cfg = dict(
            model=dict(family='pose_lifter', num_joints=17,
                       stem_channels=32, kernel_sizes=(3, 3),
                       with_traj=True),
            loss_semi=dict(projection_loss_weight=0.1,
                           bone_loss_weight=1.0, warmup_iterations=1),
            data=dict(dataset='h36m', semi_supervised=True, seq_len=9,
                      batch_size=2,
                      train=dict(ann_file=h36m, camera_param_file=cams),
                      train_unlabeled=dict(ann_file=h36m,
                                           camera_param_file=cams)),
            optimizer=dict(base_lr=1e-3, lr_decay=0.975, total_epochs=1),
            runtime=dict(work_dir=wd))
        variables, metrics = train_model(cfg, max_steps=3)
        for k in ('mpjpe_loss', 'traj_loss', 'proj_loss', 'bone_loss'):
            assert k in metrics and np.isfinite(metrics[k]), (k, metrics)
        # past warmup (steps 2,3) the semi losses are live
        assert metrics['proj_loss'] != 0.0 or metrics['bone_loss'] != 0.0
        assert os.path.exists(os.path.join(wd, 'final.npz'))

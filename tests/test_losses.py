"""Golden tests: jnp losses vs the reference torch loss implementations."""
import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

from vitpose_tpu.models import losses as L
from vitpose_tpu.models import losses_regression as LR

REF = "/root/reference"

RNG = np.random.RandomState(3)


def _load_losses(fname, name):
    if name in sys.modules:
        return sys.modules[name]

    class _Registry:
        def register_module(self, *a, **k):
            def deco(cls):
                return cls
            return deco

    builder = types.ModuleType("mmpose.models.builder")
    builder.LOSSES = _Registry()
    for mod_name, m in [("mmpose", types.ModuleType("mmpose")),
                        ("mmpose.models", types.ModuleType("mmpose.models")),
                        ("mmpose.models.builder", builder)]:
        sys.modules[mod_name] = m
    spec = importlib.util.spec_from_file_location(
        f"mmpose.models.losses.{name}",
        f"{REF}/mmpose/models/losses/{fname}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    sys.modules[f"mmpose.models.losses.{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


def data(n=4, k=17, d=2):
    pred = RNG.randn(n, k, d).astype(np.float32)
    target = RNG.randn(n, k, d).astype(np.float32)
    w = (RNG.rand(n, k, 1) > 0.2).astype(np.float32).repeat(d, axis=2)
    return pred, target, w


def test_mse_loss_heatmap_golden():
    mod = _load_losses("mse_loss.py", "_ref_mse")
    crit = mod.JointsMSELoss(use_target_weight=True)
    pred = RNG.randn(3, 5, 8, 6).astype(np.float32)
    tgt = RNG.rand(3, 5, 8, 6).astype(np.float32)
    w = (RNG.rand(3, 5, 1) > 0.3).astype(np.float32)
    ref = float(crit(torch.from_numpy(pred), torch.from_numpy(tgt),
                     torch.from_numpy(w)))
    ours = float(L.joints_mse_loss(pred, tgt, w[..., 0]))
    assert abs(ours - ref) < 1e-6


def test_ohkm_loss_golden():
    mod = _load_losses("mse_loss.py", "_ref_mse")
    crit = mod.JointsOHKMMSELoss(use_target_weight=True, topk=3)
    pred = RNG.randn(3, 5, 8, 6).astype(np.float32)
    tgt = RNG.rand(3, 5, 8, 6).astype(np.float32)
    w = (RNG.rand(3, 5, 1) > 0.3).astype(np.float32)
    ref = float(crit(torch.from_numpy(pred), torch.from_numpy(tgt),
                     torch.from_numpy(w)))
    ours = float(L.joints_ohkm_mse_loss(pred, tgt, w[..., 0], topk=3))
    assert abs(ours - ref) < 1e-5


def test_combined_target_loss_golden():
    mod = _load_losses("mse_loss.py", "_ref_mse")
    crit = mod.CombinedTargetMSELoss(use_target_weight=True)
    pred = RNG.randn(3, 15, 8, 6).astype(np.float32)
    tgt = RNG.rand(3, 15, 8, 6).astype(np.float32)
    w = (RNG.rand(3, 5, 1) > 0.3).astype(np.float32)
    ref = float(crit(torch.from_numpy(pred), torch.from_numpy(tgt),
                     torch.from_numpy(w)))
    ours = float(L.combined_target_mse_loss(pred, tgt, w[..., 0]))
    assert abs(ours - ref) < 1e-6


@pytest.mark.parametrize("name,ours,kwargs", [
    ("SmoothL1Loss", LR.smooth_l1_loss, {}),
    ("L1Loss", LR.l1_loss, {}),
    ("MSELoss", LR.mse_loss, {}),
    ("WingLoss", LR.wing_loss, {}),
    ("SoftWingLoss", LR.soft_wing_loss, {}),
    ("MPJPELoss", LR.mpjpe_loss, {}),
])
def test_regression_losses_golden(name, ours, kwargs):
    mod = _load_losses("regression_loss.py", "_ref_reg")
    crit = getattr(mod, name)(use_target_weight=True)
    pred, target, w = data()
    ref = float(crit(torch.from_numpy(pred), torch.from_numpy(target),
                     torch.from_numpy(w)))
    got = float(ours(pred, target, w, **kwargs))
    assert abs(got - ref) < 1e-5, (name, got, ref)


def test_bone_loss_golden():
    mod = _load_losses("regression_loss.py", "_ref_reg")
    parents = [0, 0, 1, 2, 0, 4, 5]
    crit = mod.BoneLoss(joint_parents=parents, use_target_weight=False)
    pred = RNG.randn(3, 7, 3).astype(np.float32)
    target = RNG.randn(3, 7, 3).astype(np.float32)
    ref = float(crit(torch.from_numpy(pred), torch.from_numpy(target)))
    got = float(LR.bone_loss(pred, target, parents))
    assert abs(got - ref) < 1e-5


def test_ae_heatmap_loss_golden():
    mod = _load_losses("multi_loss_factory.py", "_ref_multi")
    crit = mod.HeatmapLoss(supervise_empty=False)
    pred = RNG.randn(2, 4, 8, 6).astype(np.float32)
    gt = np.zeros((2, 4, 8, 6), np.float32)
    gt[:, :2] = RNG.rand(2, 2, 8, 6)
    mask = (RNG.rand(2, 8, 6) > 0.2).astype(np.float32)
    ref = crit(torch.from_numpy(pred), torch.from_numpy(gt),
               torch.from_numpy(mask)).mean().item()
    got = float(LR.ae_heatmap_loss(pred, gt, mask, supervise_empty=False))
    assert abs(got - ref) < 1e-6


@pytest.mark.parametrize("loss_type", ["exp", "max"])
def test_ae_tag_loss_golden(loss_type):
    mod = _load_losses("multi_loss_factory.py", "_ref_multi")
    crit = mod.AELoss(loss_type=loss_type)
    n, m, k, hw = 2, 5, 4, 48
    tags = RNG.randn(n, k * hw, 1).astype(np.float32)
    joints = np.zeros((n, m, k, 2), np.int64)
    for i in range(n):
        for p in range(3):  # 3 real persons, 2 padded
            for j in range(k):
                if RNG.rand() > 0.3:
                    joints[i, p, j] = [RNG.randint(0, k * hw), 1]
    push_ref, pull_ref = crit(torch.from_numpy(tags),
                              torch.from_numpy(joints))
    push_ref = torch.stack([p.squeeze() for p in push_ref]).numpy()
    pull_ref = torch.stack([p.squeeze() for p in pull_ref]).numpy()
    push, pull = LR.ae_tag_loss(tags, joints, loss_type=loss_type)
    np.testing.assert_allclose(np.asarray(push), push_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pull), pull_ref, atol=1e-5)


def test_adaptive_wing_loss_golden():
    mod = _load_losses("heatmap_loss.py", "_ref_heatmap_loss")
    pred = RNG.randn(2, 4, 8, 6).astype(np.float32)
    tgt = RNG.rand(2, 4, 8, 6).astype(np.float32)
    w = (RNG.rand(2, 4, 1) > 0.3).astype(np.float32)
    for use_w in (False, True):
        crit = mod.AdaptiveWingLoss(use_target_weight=use_w,
                                    loss_weight=2.0)
        ref = float(crit(torch.from_numpy(pred), torch.from_numpy(tgt),
                         torch.from_numpy(w)))
        ours = float(L.adaptive_wing_loss(
            pred, tgt, w[..., 0] if use_w else None, loss_weight=2.0))
        assert abs(ours - ref) < 1e-5, (use_w, ours, ref)

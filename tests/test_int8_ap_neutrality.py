"""AP-neutrality of the FAST serving path (int8 W8A8 MLP+qkv, tanh GELU).

The eval-protocol throughput leader (PERF.md: 1418 img/s flip-test vs 1059
exact) is the int8 fast path. Heatmap-deviation bounds (test_int8_serving)
don't directly bound the METRIC; this measures the error budget in the
units AP actually consumes:

  1. full-pipeline AP equality on the overfit COCO-fixture model — the
     same harness as test_e2e_ap_parity (loader -> jit warp+flip+decode ->
     rescoring/oks_nms -> COCOeval), exact path vs fast path;
  2. a per-prediction OKS budget between the two paths' keypoints — AP can
     only move when a prediction crosses one of the 10 OKS thresholds, so
     OKS(exact_pred, fast_pred) ~ 1 pins the achievable AP shift.

No released weights exist on disk (no egress), so the overfit fixture
model is the strongest available subject; the budget methodology transfers
unchanged to real checkpoints (tools/test.py --int8).
"""
import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

import test_e2e_ap_parity as E2E

from vitpose_tpu.data import TopDownDataset, DatasetInfo
from vitpose_tpu.data.loader import TopDownLoader
from vitpose_tpu.eval.loop import run_validation
from vitpose_tpu.models import TopDownModel, make_config
from vitpose_tpu.models.vit import ViTConfig
from vitpose_tpu.ops.nms import oks_iou
from vitpose_tpu.utils import torch_ckpt as CK
from vitpose_tpu.utils.quantize import (calibrate_act_scales,
                                        int8_serving_config)


@pytest.fixture(scope='module')
def trained():
    return E2E.trained_pair.__wrapped__()


def _exact_cfg():
    cfg = make_config('s', img_size=(128, 96), out_channels=17,
                      flip_test=True, use_udp=True, post_process='default',
                      shift_heatmap=False)
    return cfg.__class__(**{**cfg.__dict__,
                            'backbone': ViTConfig(img_size=(128, 96),
                                                  embed_dim=96, depth=2,
                                                  num_heads=4),
                            'deconv_filters': (64, 64)})


def _convert(tv, head, cfg):
    sd = {}
    sd.update({'backbone.' + k: v.detach().numpy()
               for k, v in tv.state_dict().items()})
    sd.update({'keypoint_head.' + k: v.detach().numpy()
               for k, v in head.state_dict().items()})
    return CK.convert_topdown_checkpoint(sd, cfg)


@pytest.mark.slow
def test_int8_fast_path_ap_neutral(trained):
    tv, head, db = trained
    cfg = _exact_cfg()
    variables = _convert(tv, head, cfg)
    model = TopDownModel(cfg)

    ds = TopDownDataset(E2E.ANN, E2E.PREFIX, dataset_info='coco',
                        image_size=(96, 128), heatmap_size=(24, 32),
                        test_mode=True, use_gt_bbox=True)
    loader = TopDownLoader(ds, batch_size=4, is_train=False)
    exact_results = run_validation(model, variables, loader, use_udp=True,
                                   post_process='default')
    exact_stats = ds.evaluate(exact_results)
    assert exact_stats['AP'] > 0.1, exact_stats   # else 0 == 0 is vacuous

    # calibrate on the fixture crops themselves (the deployment workflow:
    # a few representative batches through the float model)
    crops = np.stack([E2E._ref_crop(rec)[0] for rec in db])
    crops = jnp.asarray(crops.transpose(0, 2, 3, 1))
    scales = calibrate_act_scales(model, variables, [crops], attn=True)
    fast_cfg = int8_serving_config(cfg, scales, qkv=True)
    fast_cfg = dataclasses.replace(
        fast_cfg, backbone=dataclasses.replace(fast_cfg.backbone,
                                               gelu_approx=True))
    fast_model = TopDownModel(fast_cfg)
    fast_results = run_validation(fast_model, variables, loader,
                                  use_udp=True, post_process='default')
    fast_stats = ds.evaluate(fast_results)

    # 1) metric-level budget: the composite AP/AR (mean over the 10 OKS
    # thresholds) within 0.005; single-threshold stats get 0.02 — on a
    # 17-instance fixture ONE prediction sliding across one threshold
    # bin quantizes to ~0.007, which the OKS budget below bounds anyway
    for name, ref_v in exact_stats.items():
        tol = 5e-3 if name in ('AP', 'AR') else 2e-2
        assert abs(fast_stats[name] - ref_v) <= tol, (
            name, fast_stats[name], ref_v, dict(exact_stats),
            dict(fast_stats))

    # 2) prediction-level OKS budget: the fast path's keypoints score
    # OKS ~ 1 against the exact path's for EVERY instance, so no
    # prediction can cross an AP threshold bin unless it sat exactly on
    # the boundary
    sigmas = np.asarray(DatasetInfo.load('coco').sigmas)
    exact_preds = np.concatenate([r['preds'] for r in exact_results])
    fast_preds = np.concatenate([r['preds'] for r in fast_results])
    boxes = np.concatenate([r['boxes'] for r in exact_results])
    assert exact_preds.shape == fast_preds.shape
    oks_all = []
    for i in range(exact_preds.shape[0]):
        g = exact_preds[i].copy()
        g[:, 2] = 1.0                      # treat every joint as labeled
        a = float(boxes[i, 4])             # box area (scale*200)^2
        oks = oks_iou(g.flatten(),
                      fast_preds[i][:, :3].reshape(1, -1),
                      a, np.asarray([a]), sigmas=sigmas)
        oks_all.append(float(oks[0]))
    oks_all = np.asarray(oks_all)
    assert oks_all.min() >= 0.95, oks_all
    assert oks_all.mean() >= 0.99, oks_all.mean()


@pytest.mark.slow
def test_calibrate_from_loader_drives_fast_path(trained):
    """calibrate_from_loader (the tools/test.py --int8 workflow) yields
    4-tuple scales from the eval loader's own preprocessing, and the
    resulting fast model evaluates with finite AP close to exact."""
    from vitpose_tpu.utils.quantize import calibrate_from_loader
    tv, head, db = trained
    cfg = _exact_cfg()
    variables = _convert(tv, head, cfg)
    model = TopDownModel(cfg)
    ds = TopDownDataset(E2E.ANN, E2E.PREFIX, dataset_info='coco',
                        image_size=(96, 128), heatmap_size=(24, 32),
                        test_mode=True, use_gt_bbox=True)
    loader = TopDownLoader(ds, batch_size=4, is_train=False)
    scales = calibrate_from_loader(model, variables, loader, attn=True)
    assert len(scales) == cfg.backbone.depth
    assert all(len(s) == 4 and min(s) > 0 for s in scales)
    fast_cfg = int8_serving_config(cfg, scales, qkv=True)
    fast_model = TopDownModel(fast_cfg)
    results = run_validation(fast_model, variables, loader, use_udp=True,
                             post_process='default')
    stats = ds.evaluate(results)
    assert stats['AP'] > 0.1, dict(stats)

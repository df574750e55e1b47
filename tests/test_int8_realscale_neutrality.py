"""int8 AP-neutrality at REAL ViTPose-B geometry (VERDICT r3 #2).

Round 3 proved the fast serving path (int8 W8A8 MLP+qkv with calibrated
static scales + tanh GELU) AP-neutral only on a toy model (embed 96,
depth 2) — but quantization error compounds with depth and width, so that
budget does not bound the deployed 768-d/12-block ViT-B. This test re-runs
the full methodology at the REAL geometry the bench numbers are measured
at: embed 768, depth 12, 12 heads, 256x192 crops, 64x48 heatmaps.

Subject construction (no released weights exist on disk / no egress): the
REAL random-init ViT-B backbone with the SIMPLE decoder
(reference ViTPose_base_simple_coco_256x192.py — a released configuration,
AP 75.5), whose final 3x3 conv is fit in closed form (ridge regression on
the upsampled-ReLU backbone features) to the fixture's UDP targets in both
flip orientations. The fit reaches AP 1.0 on the fixture through the full
eval harness, i.e. sharply-localized peaks — the regime a trained model
operates in. The int8 error under test lives entirely in the BACKBONE
(12 blocks of quantized MLP+qkv at real width); the head is identical
float in both paths, so using the simple decoder instead of bench.py's
deconv head changes nothing about the quantization error being bounded.

MEASURED RESULT at real geometry (lambda sweep over the head fit,
recorded in PERF.md "int8 at real geometry"):

  | head |W| (ridge lam) | exact AP | fast AP | dAP    | OKS min / mean |
  | 6.6 (1e-4)           | 1.000    | 1.000   | 0.0000 | 0.882 / 0.963  |
  | 4.3 (3e-4)           | 1.000    | 1.000   | 0.0000 | 0.882 / 0.968  |
  | 2.7 (1e-3)           | 1.000    | 1.000   | 0.0000 | 0.941 / 0.983  |
  | 1.7 (3e-3)           | 0.991    | 0.991   | 0.0000 | 0.941 / 0.985  |

The composite AP delta is zero everywhere, but the per-instance OKS floor
tracks the HEAD's weight norm — high-norm interpolating fits amplify the
backbone's int8 perturbation — and plateaus at ~0.94 in the smooth-head
(trained-model-like) regime. The toy-geometry budget (OKS min >= 0.95)
therefore does NOT fully transfer to 12 blocks x 768-d: per-instance
error grows mildly with depth even though the metric stays flat on this
fixture. Decision (VERDICT r3 #2): the bench headline REMAINS bf16; the
int8 path stays available (BENCH_INT8=1, tools/test.py --int8) quoting
the real-geometry budget below, not the toy one.

ROUND-5 CLOSURE (tools/analysis/int8_selective_sweep.py, PERF.md
"Round-5: int8 selective-quantization sweep"): the 0.941 floor is NOT
accumulated int8 error — quantizing any SINGLE block alone reproduces
it exactly (a fixture instance sits on a decode-bin threshold that any
perturbation flips). No first/last-k bf16 subset reaches 0.95; the
headline decision above is final.

Budgets ASSERTED here (smooth-head fit, lam=1e-3): composite AP/AR delta
<= 0.005, per-instance OKS(exact, fast) min >= 0.90, mean >= 0.97.

Reference eval protocol being preserved:
/root/reference/mmpose/core/evaluation/top_down_eval.py:474,
topdown_coco_dataset.py:406-595.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitpose_tpu.data import TopDownDataset, DatasetInfo
from vitpose_tpu.data.loader import TopDownLoader
from vitpose_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD
from vitpose_tpu.eval.loop import run_validation
from vitpose_tpu.models import TopDownModel, make_config
from vitpose_tpu.ops.geometry import udp_warp_matrix
from vitpose_tpu.ops.nms import oks_iou
from vitpose_tpu.ops.target import generate_udp_heatmaps
from vitpose_tpu.ops.warp import warp_affine_batch
from vitpose_tpu.utils.quantize import (calibrate_act_scales,
                                        int8_serving_config)

REF = '/root/reference'
ANN = f'{REF}/tests/data/coco/test_coco.json'
PREFIX = f'{REF}/tests/data/coco/'

pytestmark = pytest.mark.slow


def _fixture_crops(loader):
    """Eval-pipeline crops + crop-frame joints for every fixture record
    (identical math to eval/loop.py make_val_step)."""
    crops_all, joints_all, vis_all = [], [], []
    for b in loader:
        valid = b['valid']
        x = jnp.asarray(b['imgs']).astype(jnp.float32) / 255.0
        mat = udp_warp_matrix(jnp.zeros(b['center'].shape[0]),
                              jnp.asarray(b['center']),
                              jnp.asarray(b['scale']), (192, 256))
        crops = warp_affine_batch(x, mat, (192, 256))
        crops = (crops - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(
            IMAGENET_STD)
        m = np.asarray(mat)
        j = np.asarray(b['joints'])[..., :2]
        jc = np.einsum('nij,nkj->nki', m[:, :, :2], j) + m[:, None, :, 2]
        crops_all.append(np.asarray(crops)[valid])
        joints_all.append(jc[valid])
        vis_all.append(np.asarray(b['vis'])[valid])
    return (np.concatenate(crops_all), np.concatenate(joints_all),
            np.concatenate(vis_all))


def _fit_final_conv(model, variables, crops, joints, vis, flip_index):
    """Closed-form ridge fit of the simple head's final 3x3 conv on the
    frozen real-B backbone features, both flip orientations (so the
    flip-test average stays peaked)."""
    def pre_final(x):
        _, st = model.apply(
            variables, jnp.asarray(x), train=False,
            capture_intermediates=lambda mdl, m: mdl.name == 'backbone')
        f = jax.nn.relu(st['intermediates']['backbone']['__call__'][0])
        n, h, w, c = f.shape
        return np.asarray(jax.image.resize(f, (n, h * 4, w * 4, c),
                                           method='bilinear'))

    U = np.concatenate([pre_final(crops), pre_final(crops[:, :, ::-1])])
    vk = vis[..., 0] if vis.ndim == 3 else vis
    tgt, _ = generate_udp_heatmaps(joints, vk, (192, 256), (48, 64),
                                   sigma=2.0)
    jf = joints.copy()
    jf[..., 0] = (192 - 1.0) - jf[..., 0]
    jf = jf[:, flip_index]
    tgt_f, _ = generate_udp_heatmaps(jf, vk[:, flip_index], (192, 256),
                                     (48, 64), sigma=2.0)
    Y = np.concatenate([np.asarray(tgt), np.asarray(tgt_f)]).transpose(
        0, 2, 3, 1).reshape(-1, 17)

    n, h, w, c = U.shape
    Upad = np.pad(U, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = np.empty((n, h, w, 9 * c), np.float32)
    for dy in range(3):
        for dx in range(3):
            cols[..., (dy * 3 + dx) * c:(dy * 3 + dx + 1) * c] = \
                Upad[:, dy:dy + h, dx:dx + w]
    X = cols.reshape(-1, 9 * c)
    X = np.concatenate([X, np.ones((X.shape[0], 1), np.float32)], 1)
    A = X.T @ X
    # lambda 1e-3*mean-eigenvalue: the smooth-head regime (|W| ~ 2.7) —
    # environment-stable (small-lambda solves sit in a fragile
    # interpolation regime where XLA thread-count changes the solution)
    # and trained-model-like in sensitivity (see module docstring table)
    A += (1e-3 * np.trace(A) / A.shape[0]) * np.eye(A.shape[0],
                                                    dtype=np.float32)
    B = X.T @ Y
    W = np.linalg.solve(A.astype(np.float64),
                        B.astype(np.float64)).astype(np.float32)

    p = dict(variables['params'])
    head = dict(p['head'])
    head['final'] = {'kernel': jnp.asarray(W[:-1].reshape(3, 3, c, 17)),
                     'bias': jnp.asarray(W[-1])}
    p['head'] = head
    return {**variables, 'params': p}


def test_int8_fast_path_ap_neutral_real_vitpose_b():
    cfg = make_config('b', img_size=(256, 192), head='simple',
                      out_channels=17, flip_test=True, use_udp=True,
                      post_process='default', shift_heatmap=False)
    model = TopDownModel(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 192, 3)))

    ds = TopDownDataset(ANN, PREFIX, dataset_info='coco',
                        image_size=(192, 256), heatmap_size=(48, 64),
                        test_mode=True, use_gt_bbox=True)
    loader = TopDownLoader(ds, batch_size=7, is_train=False)
    flip_index = np.asarray(DatasetInfo.load('coco').flip_index)

    crops, joints, vis = _fixture_crops(loader)
    assert crops.shape[1:] == (256, 192, 3)
    variables = _fit_final_conv(model, variables, crops, joints, vis,
                                flip_index)

    exact_results = run_validation(model, variables, loader, use_udp=True,
                                   post_process='default')
    exact_stats = ds.evaluate(exact_results)
    # the fit must put the subject in the trained-model regime: sharply
    # localized peaks that decode to the annotations (else 0 == 0 vacuous)
    assert exact_stats['AP'] >= 0.9, dict(exact_stats)

    # deployed fast path: calibrate static scales on the fixture crops
    # (the deployment workflow), quantize MLP+qkv, tanh GELU
    scales = calibrate_act_scales(model, variables,
                                  [jnp.asarray(crops)], attn=True)
    fast_cfg = int8_serving_config(cfg, scales, qkv=True)
    fast_cfg = dataclasses.replace(
        fast_cfg, backbone=dataclasses.replace(fast_cfg.backbone,
                                               gelu_approx=True))
    fast_model = TopDownModel(fast_cfg)
    fast_results = run_validation(fast_model, variables, loader,
                                  use_udp=True, post_process='default')
    fast_stats = ds.evaluate(fast_results)

    # 1) metric-level budget at REAL geometry
    for name, ref_v in exact_stats.items():
        tol = 5e-3 if name in ('AP', 'AR') else 2e-2
        assert abs(fast_stats[name] - ref_v) <= tol, (
            name, fast_stats[name], ref_v, dict(exact_stats),
            dict(fast_stats))

    # 2) prediction-level OKS budget: 12 blocks of int8 error at 768-d
    # must not move any prediction across an AP threshold bin
    sigmas = np.asarray(DatasetInfo.load('coco').sigmas)
    exact_preds = np.concatenate([r['preds'] for r in exact_results])
    fast_preds = np.concatenate([r['preds'] for r in fast_results])
    boxes = np.concatenate([r['boxes'] for r in exact_results])
    assert exact_preds.shape == fast_preds.shape
    oks_all = []
    for i in range(exact_preds.shape[0]):
        g = exact_preds[i].copy()
        g[:, 2] = 1.0
        a = float(boxes[i, 4])
        oks = oks_iou(g.flatten(),
                      fast_preds[i][:, :3].reshape(1, -1),
                      a, np.asarray([a]), sigmas=sigmas)
        oks_all.append(float(oks[0]))
    oks_all = np.asarray(oks_all)
    # real-geometry budget (see module docstring): the smooth-head OKS
    # floor plateaus at ~0.94; gates carry margin below the measurement
    assert oks_all.min() >= 0.90, oks_all
    assert oks_all.mean() >= 0.97, oks_all.mean()

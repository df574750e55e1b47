"""End-to-end AP equality vs the reference evaluation pipeline.

The strongest AP-parity statement available without released weights: a tiny
reference torch TopDown model is overfit on the COCO fixture, then evaluated

  * the REFERENCE way: cv2 UDP affine (top_down_transform.TopDownAffine) ->
    torch forward with flip test (flip_back, shift_heatmap=False) -> numpy
    keypoints_from_heatmaps (top_down_eval.py) -> rescoring + oks_nms
    (topdown_coco_dataset.py:406-520) -> vendored COCOeval (_cocoeval.py);

  * the vitpose_tpu way: TopDownLoader canvas batches -> one jit
    (warp+normalize+infer(flip)+decode) -> TopDownDataset.evaluate.

The asserted AP equality fails if ANY integration convention drifts: canvas
handling, center/scale frames, crop warp, flip averaging, decode,
rescoring, NMS, or the COCO stats computation.
"""
import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_loader import (ref_vit, ref_simple_head, ref_top_down_transform,
                        ref_post_transforms, ref_top_down_eval, ref_nms)

REF = "/root/reference"
ANN = f"{REF}/tests/data/coco/test_coco.json"
PREFIX = f"{REF}/tests/data/coco/"

IMAGE_SIZE = np.array([96, 128])        # (w, h)
HEATMAP_SIZE = np.array([24, 32])
MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


def _load_ref_cocoeval():
    name = "_ref_cocoeval_e2e"
    if name in sys.modules:
        return sys.modules[name]
    pkg = types.ModuleType("_refpkg2")
    pkg.__path__ = [f"{REF}/mmpose/datasets/datasets/top_down"]
    sys.modules["_refpkg2"] = pkg
    mask_stub = types.ModuleType("_refpkg2._mask")
    mask_stub.iou = lambda *a, **k: np.zeros((0, 0))
    sys.modules["_refpkg2._mask"] = mask_stub
    spec = importlib.util.spec_from_file_location(
        "_refpkg2._cocoeval",
        f"{REF}/mmpose/datasets/datasets/top_down/_cocoeval.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_refpkg2._cocoeval"] = mod
    spec.loader.exec_module(mod)
    sys.modules[name] = mod
    return mod


def _build_torch_model():
    torch.manual_seed(0)
    tv = ref_vit().ViT(img_size=(128, 96), patch_size=16, embed_dim=96,
                       depth=2, num_heads=4, mlp_ratio=4, qkv_bias=True,
                       drop_path_rate=0.0)
    head = ref_simple_head().TopdownHeatmapSimpleHead(
        in_channels=96, out_channels=17, num_deconv_layers=2,
        num_deconv_filters=(64, 64), num_deconv_kernels=(4, 4),
        extra=dict(final_conv_kernel=1))
    return tv, head


def _ref_db():
    """Replicate the reference COCO db + TopDownGetBboxCenterScale exactly
    (topdown_coco_dataset.py:276-330 + top_down_transform.py:44)."""
    import json
    tdt = ref_top_down_transform()
    with open(ANN) as f:
        d = json.load(f)
    imgs = {im['id']: im for im in d['images']}
    db = []
    for img_id in sorted(imgs):
        im = imgs[img_id]
        width, height = im['width'], im['height']
        bbox_id = 0
        for ann in d['annotations']:
            if ann['image_id'] != img_id or ann.get('iscrowd', 0):
                continue
            if 'bbox' not in ann or 'keypoints' not in ann:
                continue
            x, y, w, h = ann['bbox']
            x1, y1 = max(0, x), max(0, y)
            x2 = min(width - 1, x1 + max(0, w))
            y2 = min(height - 1, y1 + max(0, h))
            if not (ann.get('area', 1) > 0 and x2 > x1 and y2 > y1):
                continue
            if max(ann['keypoints']) == 0 or ann.get('num_keypoints', 1) == 0:
                continue
            kp = np.asarray(ann['keypoints'], np.float32).reshape(-1, 3)
            joints = np.zeros((17, 3), np.float32)
            visible = np.zeros((17, 3), np.float32)
            joints[:, :2] = kp[:, :2]
            visible[:, :2] = np.minimum(1, kp[:, 2:3])
            center, scale = tdt.bbox_xywh2cs(
                np.array([x1, y1, x2 - x1, y2 - y1], np.float32),
                aspect_ratio=IMAGE_SIZE[0] / IMAGE_SIZE[1],
                padding=1.25, pixel_std=200.0)
            db.append(dict(image_file=PREFIX + im['file_name'],
                           image_id=img_id, center=center, scale=scale,
                           joints_3d=joints, joints_3d_visible=visible,
                           bbox_id=bbox_id, bbox_score=1.0))
            bbox_id += 1
    return db


def _ref_crop(rec):
    """Reference val pipeline: LoadImageFromFile(rgb) + TopDownAffine(udp) +
    normalize -> CHW float tensor."""
    import cv2
    tdt = ref_top_down_transform()
    affine = tdt.TopDownAffine(use_udp=True)
    img = cv2.cvtColor(cv2.imread(rec['image_file']), cv2.COLOR_BGR2RGB)
    results = dict(img=img, center=rec['center'], scale=rec['scale'],
                   rotation=0, joints_3d=rec['joints_3d'].copy(),
                   joints_3d_visible=rec['joints_3d_visible'].copy(),
                   ann_info=dict(image_size=IMAGE_SIZE,
                                 num_joints=17,
                                 heatmap_size=HEATMAP_SIZE))
    results = affine(results)
    x = (results['img'].astype(np.float32) / 255.0 - MEAN) / STD
    return x.transpose(2, 0, 1), results


def _udp_target(results):
    tdt = ref_top_down_transform()
    gen = tdt.TopDownGenerateTarget(sigma=2, encoding='UDP',
                                    target_type='GaussianHeatmap')
    r = dict(results)
    r['ann_info'] = dict(results['ann_info'],
                         joint_weights=np.ones((17, 1), np.float32),
                         use_different_joint_weights=False)
    r = gen(r)
    return r['target'], r['target_weight']


@pytest.fixture(scope='module')
def trained_pair():
    """Overfit the tiny torch model on the fixture crops so heatmaps are
    sharply peaked (random init would put both pipelines at AP ~ 0, which
    asserts nothing)."""
    tv, head = _build_torch_model()
    db = _ref_db()
    crops, targets, weights = [], [], []
    for rec in db:
        x, results = _ref_crop(rec)
        t, w = _udp_target(results)
        crops.append(x)
        targets.append(t)
        weights.append(w)
    X = torch.from_numpy(np.stack(crops))
    T = torch.from_numpy(np.stack(targets))
    W = torch.from_numpy(np.stack(weights))

    params = list(tv.parameters()) + list(head.parameters())
    opt = torch.optim.Adam(params, lr=5e-3)
    tv.train()
    head.train()
    for _ in range(600):
        opt.zero_grad()
        out = head(tv(X))
        loss = (((out - T) ** 2) * W[..., None]).mean()
        loss.backward()
        opt.step()
    tv.eval()
    head.eval()
    return tv, head, db


def _reference_eval(tv, head, db):
    """The full reference test path on the fixture db."""
    pt = ref_post_transforms()
    tde = ref_top_down_eval()
    nms_mod = ref_nms()
    from vitpose_tpu.data import DatasetInfo
    flip_pairs = DatasetInfo.load('coco').flip_pairs

    from collections import defaultdict
    kpts = defaultdict(list)
    for rec in db:
        x, _ = _ref_crop(rec)
        t = torch.from_numpy(x)[None]
        with torch.no_grad():
            hm = head(tv(t)).numpy()
            hm_f = head(tv(t.flip(3))).numpy()
        hm_f = pt.flip_back(hm_f, flip_pairs, target_type='GaussianHeatmap')
        # test_cfg: shift_heatmap=False
        hm_avg = (hm + hm_f) * 0.5
        preds, maxvals = tde.keypoints_from_heatmaps(
            hm_avg, np.asarray(rec['center'])[None],
            np.asarray(rec['scale'])[None], unbiased=False,
            post_process='default', kernel=11, use_udp=True,
            target_type='GaussianHeatmap')
        c, s = np.asarray(rec['center']), np.asarray(rec['scale'])
        kpts[rec['image_id']].append(dict(
            keypoints=np.concatenate([preds[0], maxvals[0]], axis=1),
            center=c, scale=s, area=float(np.prod(s * 200.0)),
            score=rec['bbox_score'], image_id=rec['image_id'],
            bbox_id=rec['bbox_id']))

    # rescoring + oks_nms (topdown_coco_dataset.py:470-505)
    sigmas = DatasetInfo.load('coco').sigmas
    detections = []
    for image_id, items in kpts.items():
        items.sort(key=lambda k: k['bbox_id'])
        for p in items:
            conf = p['keypoints'][:, 2]
            sel = conf > 0.2
            kpt_score = conf[sel].mean() if sel.any() else 0.0
            p['score'] = float(kpt_score * p['score'])
        keep = nms_mod.oks_nms(items, 0.9, sigmas=np.asarray(sigmas))
        for i in keep:
            p = items[i]
            detections.append(dict(
                image_id=int(image_id), category_id=1,
                keypoints=np.asarray(p['keypoints'],
                                     np.float64).flatten().tolist(),
                score=float(p['score'])))

    from vitpose_tpu.data import CocoIndex
    gt = CocoIndex(ANN)
    dt = gt.loadRes(detections)
    refmod = _load_ref_cocoeval()
    E = refmod.COCOeval(gt, dt, iouType='keypoints',
                        sigmas=np.asarray(sigmas))
    E.params.useSegm = None
    E.evaluate()
    E.accumulate()
    E.summarize()
    names = ['AP', 'AP .5', 'AP .75', 'AP (M)', 'AP (L)',
             'AR', 'AR .5', 'AR .75', 'AR (M)', 'AR (L)']
    return dict(zip(names, E.stats[:10]))


def _tpu_eval(tv, head, db):
    """The vitpose_tpu path with the converted weights."""
    from vitpose_tpu.data import TopDownDataset
    from vitpose_tpu.data.loader import TopDownLoader
    from vitpose_tpu.eval.loop import run_validation
    from vitpose_tpu.models import TopDownModel, make_config
    from vitpose_tpu.models.vit import ViTConfig
    from vitpose_tpu.utils import torch_ckpt as CK

    sd = {}
    sd.update({'backbone.' + k: v.detach().numpy()
               for k, v in tv.state_dict().items()})
    sd.update({'keypoint_head.' + k: v.detach().numpy()
               for k, v in head.state_dict().items()})
    cfg = make_config('s', img_size=(128, 96), out_channels=17,
                      flip_test=True, use_udp=True, post_process='default',
                      shift_heatmap=False)
    cfg = cfg.__class__(**{**cfg.__dict__,
                           'backbone': ViTConfig(img_size=(128, 96),
                                                 embed_dim=96, depth=2,
                                                 num_heads=4),
                           'deconv_filters': (64, 64)})
    variables = CK.convert_topdown_checkpoint(sd, cfg)
    model = TopDownModel(cfg)

    ds = TopDownDataset(ANN, PREFIX, dataset_info='coco',
                        image_size=(96, 128), heatmap_size=(24, 32),
                        test_mode=True, use_gt_bbox=True)
    assert len(ds.db) == len(db), (len(ds.db), len(db))
    loader = TopDownLoader(ds, batch_size=4, is_train=False)
    results = run_validation(model, variables, loader, use_udp=True,
                             post_process='default')
    return ds.evaluate(results)


@pytest.mark.slow
def test_e2e_ap_equality(trained_pair):
    tv, head, db = trained_pair
    ref_stats = _reference_eval(tv, head, db)
    tpu_stats = _tpu_eval(tv, head, db)
    # the overfit model must be meaningfully accurate, else 0 == 0 proves
    # nothing
    assert ref_stats['AP'] > 0.1, ref_stats
    for name, ref_v in ref_stats.items():
        assert abs(tpu_stats[name] - ref_v) <= 1e-3, (
            name, tpu_stats[name], ref_v, ref_stats, dict(tpu_stats))


@pytest.mark.slow
def test_e2e_det_bbox_ap_equality(trained_pair):
    """Same equality through the DETECTION-box path (bbox_file + rescoring
    with detector scores), the protocol of the headline 75.8 AP number."""
    tv, head, db = trained_pair
    import json
    det_file = f"{PREFIX}test_coco_det_AP_H_56.json"
    tdt = ref_top_down_transform()
    with open(det_file) as f:
        dets = json.load(f)
    with open(ANN) as f:
        d = json.load(f)
    id2name = {im['id']: im['file_name'] for im in d['images']}

    det_db = []
    bbox_id = 0
    for det in dets:
        if det.get('category_id', 1) != 1 or det['score'] < 0.0:
            continue
        center, scale = tdt.bbox_xywh2cs(
            np.asarray(det['bbox'][:4], np.float32),
            aspect_ratio=IMAGE_SIZE[0] / IMAGE_SIZE[1],
            padding=1.25, pixel_std=200.0)
        det_db.append(dict(image_file=PREFIX + id2name[det['image_id']],
                           image_id=det['image_id'], center=center,
                           scale=scale,
                           joints_3d=np.zeros((17, 3), np.float32),
                           joints_3d_visible=np.ones((17, 3), np.float32),
                           bbox_id=bbox_id, bbox_score=float(det['score'])))
        bbox_id += 1

    ref_stats = _reference_eval(tv, head, det_db)

    from vitpose_tpu.data import TopDownDataset
    from vitpose_tpu.data.loader import TopDownLoader
    from vitpose_tpu.eval.loop import run_validation
    from vitpose_tpu.models import TopDownModel, make_config
    from vitpose_tpu.models.vit import ViTConfig
    from vitpose_tpu.utils import torch_ckpt as CK

    sd = {}
    sd.update({'backbone.' + k: v.detach().numpy()
               for k, v in tv.state_dict().items()})
    sd.update({'keypoint_head.' + k: v.detach().numpy()
               for k, v in head.state_dict().items()})
    cfg = make_config('s', img_size=(128, 96), out_channels=17,
                      flip_test=True, use_udp=True, post_process='default')
    cfg = cfg.__class__(**{**cfg.__dict__,
                           'backbone': ViTConfig(img_size=(128, 96),
                                                 embed_dim=96, depth=2,
                                                 num_heads=4),
                           'deconv_filters': (64, 64)})
    variables = CK.convert_topdown_checkpoint(sd, cfg)
    model = TopDownModel(cfg)
    ds = TopDownDataset(ANN, PREFIX, dataset_info='coco',
                        image_size=(96, 128), heatmap_size=(24, 32),
                        test_mode=True, use_gt_bbox=False,
                        bbox_file=det_file, det_bbox_thr=0.0)
    assert len(ds.db) == len(det_db), (len(ds.db), len(det_db))
    loader = TopDownLoader(ds, batch_size=8, is_train=False)
    results = run_validation(model, variables, loader, use_udp=True,
                             post_process='default')
    tpu_stats = ds.evaluate(results)
    for name, ref_v in ref_stats.items():
        assert abs(tpu_stats[name] - ref_v) <= 1e-3, (
            name, tpu_stats[name], ref_v)

"""User-facing inference API, signature-compatible with the reference
(mmpose/apis/inference.py:21 `init_pose_model`, :295
`inference_top_down_pose_model`, `vis_pose_result`).

TPU-first differences under the hood:
  * person boxes are cropped in ONE batched on-device warp (the reference
    runs a cv2 pipeline per box on host, inference.py:115-292);
  * box batches are padded to bucket sizes so jit compiles a handful of
    shapes instead of one per person count;
  * flip test + decode run inside the same jit.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Union

import numpy as np

from ..data.dataset_info import DatasetInfo
from ..data.pipeline import IMAGENET_MEAN, IMAGENET_STD
from ..models import TopDownModel, make_config, infer
from ..models.vit import VIT_VARIANTS
from ..ops.geometry import bbox_xywh2cs, udp_warp_matrix, \
    affine_matrix
from ..ops.warp import warp_affine_batch
from ..ops.decode import keypoints_from_heatmaps
from ..utils.torch_ckpt import convert_topdown_checkpoint

_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128)


def _bucket(n):
    for b in _BUCKETS:
        if n <= b:
            return b
    return ((n + 127) // 128) * 128


@dataclasses.dataclass
class PoseModel:
    """Bundle returned by init_pose_model (stands in for the torch module)."""
    model: TopDownModel
    variables: dict
    cfg: object                      # TopDownConfig
    dataset_info: DatasetInfo
    image_size: tuple                # (w, h)
    heatmap_size: tuple
    padding: float = 1.25
    _jitted: dict = dataclasses.field(default_factory=dict)

    def infer_fn(self, n, return_heatmap=False, flip_index=None):
        """flip_index overrides the model's dataset flip pairs for the
        in-jit flip test (the reference resolves them from the per-call
        `dataset`/`dataset_info`, apis/inference.py:163-242)."""
        import jax
        import jax.numpy as jnp
        if flip_index is None:
            flip_index = self.dataset_info.flip_index
        flip_index = tuple(int(i) for i in flip_index)
        key = (n, bool(return_heatmap), flip_index)
        if key not in self._jitted:
            model, cfg = self.model, self.cfg
            iw, ih = self.image_size

            @jax.jit
            def fn(variables, imgs, center, scale):
                x = imgs.astype(jnp.float32) / 255.0
                if cfg.use_udp:
                    mat = udp_warp_matrix(jnp.zeros(center.shape[0]),
                                          center, scale, (iw, ih))
                else:
                    mat = affine_matrix(center, scale,
                                        jnp.zeros(center.shape[0]), (iw, ih))
                crops = warp_affine_batch(x, mat, (iw, ih))
                crops = (crops - jnp.asarray(IMAGENET_MEAN)) \
                    / jnp.asarray(IMAGENET_STD)
                hm = infer(model, variables, crops, flip_index=flip_index)
                if cfg.head_type == 'regression':
                    # DeepPose decode (reference keypoints_from_regression)
                    from ..ops.geometry import transform_preds
                    px = hm * jnp.asarray([iw, ih], jnp.float32)
                    preds = transform_preds(px, center, scale, (iw, ih),
                                            use_udp=cfg.use_udp)
                    maxvals = jnp.ones(hm.shape[:2] + (1,), jnp.float32)
                else:
                    preds, maxvals = keypoints_from_heatmaps(
                        hm, center, scale, post_process=cfg.post_process,
                        kernel=cfg.modulate_kernel, use_udp=cfg.use_udp,
                        target_type=cfg.target_type)
                if return_heatmap:
                    return preds, maxvals, hm
                return preds, maxvals
            self._jitted[key] = fn
        return self._jitted[key]


def load_checkpoint_variables(checkpoint, model_dict=None, topdown_cfg=None):
    """Checkpoint path (.pth torch / .npz export) -> flax variables, routed
    by model kind (the tools/test.py CONFIG CHECKPOINT contract: ViT ->
    convert_topdown_checkpoint with pos-embed regrid, CNN ->
    convert_generic_topdown_checkpoint)."""
    import jax
    import jax.numpy as jnp
    if checkpoint.endswith('.npz'):
        from ..utils.checkpoint import load_params_npz
        v = load_params_npz(checkpoint)
    elif checkpoint.endswith('.pth'):
        bt = (model_dict or {}).get('backbone_type', 'vit')
        if bt == 'vit':
            v = convert_topdown_checkpoint(checkpoint, topdown_cfg)
        else:
            from ..utils.cnn_ckpt import convert_generic_topdown_checkpoint
            v = convert_generic_topdown_checkpoint(
                checkpoint, bt,
                num_units=(model_dict or {}).get('num_units', 4),
                use_prm=(model_dict or {}).get('use_prm', False))
    else:
        raise ValueError(f'unsupported checkpoint {checkpoint!r}; orbax '
                         'train dirs resume via tools/train.py')
    return jax.tree.map(jnp.asarray, v)


def init_pose_model(config, checkpoint: Optional[str] = None,
                    device: str = 'tpu') -> PoseModel:
    """Build a PoseModel from a config and optional .pth/.npz checkpoint.

    `config` may be (keeping the reference init_pose_model contract,
    apis/inference.py:21, where config is a file path or Config object):
      * a config FILE path ('configs/coco/res50_coco_256x192.py' style)
      * a dict like {'variant': 'b', 'image_size': (192, 256), ...} or a
        generic-backbone dict {'backbone_type': 'hrnet', ...}
      * a TopDownConfig
      * a variant string 'b' / 's' / 'l' / 'h'
    """
    import os as _os
    import jax
    import jax.numpy as jnp

    dataset_name = 'coco'
    padding = 1.25
    model_dict = None
    if isinstance(config, str) and config.endswith('.py') \
            and _os.path.exists(config):
        from ..utils.config import load_config
        full = load_config(config)
        if full['model'].get('family', 'topdown') != 'topdown':
            raise ValueError(
                'init_pose_model serves top-down configs; other families '
                'evaluate through tools/test.py or their api/ entry points')
        model_dict = dict(full['model'])
        dataset_name = full.get('data', {}).get('dataset', 'coco')
    elif isinstance(config, dict) and (
            'backbone_type' in config or 'family' in config):
        if config.get('family', 'topdown') != 'topdown':
            raise ValueError(
                'init_pose_model serves top-down configs; other families '
                'evaluate through tools/test.py or their api/ entry points')
        model_dict = dict(config)
        dataset_name = model_dict.pop('dataset', 'coco')
        padding = model_dict.pop('padding', 1.25)

    if model_dict is not None:
        from ..train.loop import build_model_from_cfg
        model = build_model_from_cfg(model_dict)
        cfg = model.cfg
    elif isinstance(config, str) and config in VIT_VARIANTS:
        cfg = make_config(config, img_size=(256, 192), out_channels=17)
        model = TopDownModel(cfg)
    elif isinstance(config, dict):
        c = dict(config)
        dataset_name = c.pop('dataset', 'coco')
        padding = c.pop('padding', 1.25)
        variant = c.pop('variant', 'b')
        wh = c.pop('image_size', (192, 256))
        cfg = make_config(variant, img_size=(wh[1], wh[0]), **c)
        model = TopDownModel(cfg)
    else:
        cfg = config
        model = TopDownModel(cfg)

    info = DatasetInfo.load(dataset_name)
    ih, iw = cfg.backbone.img_size
    rng = jax.random.PRNGKey(0)
    if checkpoint is not None:
        variables = load_checkpoint_variables(checkpoint, model_dict, cfg)
    else:
        variables = model.init(rng, jnp.zeros((1, ih, iw, 3)))
    hm_h, hm_w = ih // 4, iw // 4
    return PoseModel(model=model, variables=variables, cfg=cfg,
                     dataset_info=info, image_size=(iw, ih),
                     heatmap_size=(hm_w, hm_h), padding=padding)


# deprecated reference dataset-class names -> metadata names
# (reference apis/inference.py:163-242 hardcoded per-class fallbacks)
_DATASET_CLASS_TO_NAME = {
    'TopDownCocoDataset': 'coco',
    'TopDownOCHumanDataset': 'ochuman',
    'AnimalMacaqueDataset': 'macaque',
    'TopDownCocoWholeBodyDataset': 'coco_wholebody',
    'TopDownAicDataset': 'aic',
    'TopDownMpiiDataset': 'mpii',
    'TopDownMpiiTrbDataset': 'mpii_trb',
    'OneHand10KDataset': 'onehand10k',
    'FreiHandDataset': 'freihand2d',
    'PanopticDataset': 'panoptic_hand2d',
    'InterHand2DDataset': 'interhand2d',
    'Face300WDataset': '300w',
    'FaceAFLWDataset': 'aflw',
    'FaceCOFWDataset': 'cofw',
    'FaceWFLWDataset': 'wflw',
    'AnimalHorse10Dataset': 'horse10',
    'AnimalFlyDataset': 'fly',
    'AnimalLocustDataset': 'locust',
    'AnimalZebraDataset': 'zebra',
    'AnimalPoseDataset': 'animalpose',
    'AnimalAP10KDataset': 'ap10k',
    'TopDownCrowdPoseDataset': 'crowdpose',
    'TopDownJhmdbDataset': 'jhmdb',
    'TopDownHalpeDataset': 'halpe',
    'TopDownMhpDataset': 'mhp',
    'TopDownPoseTrack18Dataset': 'posetrack18',
    'TopDownH36MDataset': 'h36m',
    'DeepFashionDataset': 'deepfashion_full',
}


def _capture_intermediates(model: PoseModel, imgs_b, center_p, scale_p,
                           outputs, n):
    """Capture named submodule outputs during one plain forward — the
    functional counterpart of the reference's OutputHook
    (apis/inference.py:300, utils/hooks.py). `outputs` is an iterable of
    flax module names/paths (e.g. 'backbone', 'head')."""
    import jax
    import jax.numpy as jnp
    names = set(outputs)
    iw, ih = model.image_size
    cfg = model.cfg
    cache_key = ('capture', imgs_b.shape[0], tuple(sorted(names)))
    if cache_key not in model._jitted:
        @jax.jit
        def cap_fn(variables, imgs8, center, scale):
            x = imgs8.astype(jnp.float32) / 255.0
            if cfg.use_udp:
                mat = udp_warp_matrix(jnp.zeros(center.shape[0]),
                                      center, scale, (iw, ih))
            else:
                mat = affine_matrix(center, scale,
                                    jnp.zeros(center.shape[0]), (iw, ih))
            crops = warp_affine_batch(x, mat, (iw, ih))
            crops = (crops - jnp.asarray(IMAGENET_MEAN)) \
                / jnp.asarray(IMAGENET_STD)
            _, state = model.model.apply(
                variables, crops, train=False,
                capture_intermediates=lambda mdl, _: mdl.name in names,
                mutable=['intermediates'])
            return state
        model._jitted[cache_key] = cap_fn
    state = model._jitted[cache_key](
        model.variables, imgs_b, jnp.asarray(center_p),
        jnp.asarray(scale_p))
    flat = {}

    def walk(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + (k,) if k != '__call__' else path)
        else:
            # leaves are tuples of call outputs
            for item in (tree if isinstance(tree, (tuple, list)) else [tree]):
                key = '.'.join(p for p in path)
                arr = np.asarray(item)
                flat[key] = arr[:n] if arr.shape and arr.shape[0] >= n \
                    else arr
    walk(state.get('intermediates', {}), ())
    # keep only the modules that were asked for (other sown intermediates,
    # e.g. the int8-calibration taps, also live in this collection)
    return {k: v for k, v in flat.items()
            if k in names or (k.split('.') and k.split('.')[-1] in names)}


def inference_top_down_pose_model(model: PoseModel, img,
                                  person_results=None,
                                  bbox_thr: Optional[float] = None,
                                  format: str = 'xywh',
                                  dataset: Optional[str] = None,
                                  dataset_info: Optional[DatasetInfo] = None,
                                  return_heatmap: bool = False,
                                  outputs=None):
    """Run top-down pose on one image given person boxes.

    Args mirror the reference (apis/inference.py:295): `person_results` is a
    list of {'bbox': [x, y, w, h(, score)]} (or xyxy with format='xyxy');
    `dataset` is the deprecated reference-class-name selector (e.g.
    'TopDownCocoDataset' — prefer `dataset_info`); `return_heatmap` adds
    {'heatmap': [N, K, H, W]} to returned_outputs; `outputs` names flax
    submodules (e.g. ['backbone']) whose intermediate outputs are captured
    into returned_outputs (the reference's OutputHook, apis/inference.py:300).
    Returns (pose_results, returned_outputs): pose_results is a list of the
    input dicts extended with 'keypoints' [K, 3].
    """
    import jax.numpy as jnp
    assert format in ('xywh', 'xyxy')

    if isinstance(img, str):
        import cv2
        img = cv2.cvtColor(cv2.imread(img), cv2.COLOR_BGR2RGB)
    img = np.asarray(img)

    if person_results is None:
        h, w = img.shape[:2]
        person_results = [{'bbox': np.array([0, 0, w, h], np.float32)}]

    from .inference_3d import _select_boxes
    bboxes, _, sel = _select_boxes(person_results, bbox_thr, format)
    if len(sel) == 0:
        return [], []

    if dataset is not None and dataset_info is None:
        import warnings
        warnings.warn(
            'dataset is deprecated; use dataset_info instead '
            '(reference apis/inference.py:330)', DeprecationWarning)
        dataset_info = DatasetInfo.load(_DATASET_CLASS_TO_NAME.get(
            dataset, dataset))
    info = dataset_info or model.dataset_info
    iw, ih = model.image_size
    aspect = iw / ih
    center, scale = bbox_xywh2cs(bboxes[sel, :4], aspect,
                                 padding=model.padding)
    center = np.asarray(center)
    scale = np.asarray(scale)

    n = len(sel)
    nb = _bucket(n)
    center_p = np.concatenate(
        [center, np.tile(center[-1:], (nb - n, 1))])
    scale_p = np.concatenate([scale, np.tile(scale[-1:], (nb - n, 1))])
    imgs = jnp.asarray(img)[None]
    fn = model.infer_fn(nb, return_heatmap=return_heatmap,
                        flip_index=info.flip_index)
    # the warp gathers from the single shared image for every box
    imgs_b = jnp.broadcast_to(imgs, (nb,) + img.shape)
    out = fn(model.variables, imgs_b,
             jnp.asarray(center_p), jnp.asarray(scale_p))
    preds, maxvals = np.asarray(out[0])[:n], np.asarray(out[1])[:n]

    returned_outputs = []
    if return_heatmap or outputs:
        captured = {}
        if return_heatmap:
            captured['heatmap'] = np.asarray(out[2])[:n]
        if outputs:
            captured.update(_capture_intermediates(
                model, imgs_b, center_p, scale_p, outputs, n))
        returned_outputs.append(captured)

    pose_results = []
    for i, si in enumerate(sel):
        res = dict(person_results[si])
        res['keypoints'] = np.concatenate([preds[i], maxvals[i]], axis=1)
        pose_results.append(res)
    return pose_results, returned_outputs


def process_mmdet_results(mmdet_results, cat_id: int = 1):
    """Extract person boxes from detector output (reference
    demo/top_down_img_demo_with_mmdet.py `process_mmdet_results`)."""
    if isinstance(mmdet_results, tuple):
        det_results = mmdet_results[0]
    else:
        det_results = mmdet_results
    bboxes = det_results[cat_id - 1]
    return [{'bbox': bbox} for bbox in bboxes]


def vis_pose_result(model: PoseModel, img, result, kpt_score_thr: float = 0.3,
                    radius: int = 4, thickness: int = 1,
                    dataset_info: Optional[DatasetInfo] = None,
                    show: bool = False, out_file: Optional[str] = None):
    """Draw keypoints + skeleton (reference core/visualization/image.py:107
    `imshow_keypoints`). Returns the BGR image."""
    import cv2
    info = dataset_info or model.dataset_info
    if isinstance(img, str):
        img = cv2.imread(img)
    else:
        img = cv2.cvtColor(np.asarray(img), cv2.COLOR_RGB2BGR)
    img = img.copy()

    links = info.skeleton_links
    kp_colors = info.keypoint_colors
    sk_colors = info.skeleton_colors
    for res in result:
        kpts = np.asarray(res['keypoints'])
        for j, (x, y, s) in enumerate(kpts):
            if s < kpt_score_thr:
                continue
            color = tuple(int(c) for c in (kp_colors[j]
                                           if len(kp_colors) else
                                           (0, 255, 0)))
            cv2.circle(img, (int(x), int(y)), radius, color, -1)
        for li, (a, b) in enumerate(links):
            if kpts[a, 2] < kpt_score_thr or kpts[b, 2] < kpt_score_thr:
                continue
            color = tuple(int(c) for c in (sk_colors[li]
                                           if len(sk_colors) else
                                           (255, 128, 0)))
            cv2.line(img, (int(kpts[a, 0]), int(kpts[a, 1])),
                     (int(kpts[b, 0]), int(kpts[b, 1])), color, thickness)
    if out_file:
        cv2.imwrite(out_file, img)
    return img


def inference_bottom_up_pose_model(estimator, variables, img,
                                   dataset_info=None, pose_nms_thr=0.9,
                                   base_size=512):
    """Bottom-up inference on one image (reference apis/inference.py:425
    `inference_bottom_up_pose_model`): resize to a static base size, run the
    AE model with flip, group on host, map back to image coords, OKS-NMS.

    estimator: models.bottomup.BottomUpEstimator with trained `variables`.
    Returns (pose_results list of {'keypoints': [K,3], 'score': float}, []).
    """
    import cv2
    import jax.numpy as jnp
    from ..ops.nms import oks_nms

    if isinstance(img, str):
        img = cv2.cvtColor(cv2.imread(img), cv2.COLOR_BGR2RGB)
    img = np.asarray(img)
    h, w = img.shape[:2]
    info = dataset_info or estimator.dataset_info
    scale_f = base_size / max(h, w)
    resized = cv2.resize(img, (int(round(w * scale_f)),
                               int(round(h * scale_f))))
    canvas = np.zeros((base_size, base_size, 3), img.dtype)
    canvas[:resized.shape[0], :resized.shape[1]] = resized
    x = jnp.asarray(canvas[None]).astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)

    flip_index = info.flip_index if info is not None else \
        np.arange(estimator.num_joints)
    heatmaps, tags = estimator.infer(variables, x, flip_index)
    # the square canvas covers [0, max(h,w)] on BOTH axes of the original
    # image (top-left paste), so decode around the canvas center, not the
    # image center — (w/2, h/2) would shift every keypoint along the
    # shorter axis by (max - min)/2
    m = float(max(h, w))
    center = np.array([m / 2.0, m / 2.0], np.float32)
    scale = np.array([m / 200.0, m / 200.0], np.float32)
    preds, scores = estimator.parse(
        np.asarray(heatmaps, np.float32), np.asarray(tags, np.float32),
        center, scale)
    pose_results = [dict(keypoints=np.asarray(p)[:, :3],
                         score=float(s))
                    for p, s in zip(preds, scores)]
    if pose_results:
        for p in pose_results:
            kp = p['keypoints']
            p['area'] = float((kp[:, 0].max() - kp[:, 0].min())
                              * (kp[:, 1].max() - kp[:, 1].min()))
        # pose_nms_thr=None: no pose NMS, the reference EVAL protocol
        # (datasets apply NMS only when data_cfg use_nms=True; the 0.9
        # default mirrors the reference inference API)
        if pose_nms_thr is not None:
            keep = oks_nms(pose_results, pose_nms_thr,
                           sigmas=info.sigmas if len(info.sigmas) else None)
            pose_results = [pose_results[i] for i in keep]
    return pose_results, []


def inference_bottom_up_multi_scale(estimator, variables, img,
                                    dataset_info=None,
                                    test_scale_factor=(1.0,),
                                    base_size=512, use_udp=False,
                                    pose_nms_thr=0.9, with_flip=True,
                                    align_corners=None):
    """Multi-scale (optionally UDP-aligned) bottom-up inference — the
    reference's default test protocol (associative_embedding.py:28
    `forward_test`): per scale, `resize_align_multi_scale(_udp)` the
    image, run the AE model on the original and flipped views, project
    both to the base image size (`aggregate_stage_flip`), average the
    per-scale heatmaps (`aggregate_scale`), keep tags from scale 1 only,
    then group and map to image coords with the matching UDP convention.
    """
    import cv2
    import jax.numpy as jnp
    from ..data.bottomup import (resize_align_multi_scale,
                                 get_multi_scale_size)
    from ..models.bottomup import (aggregate_stage_flip, aggregate_scale,
                                   flip_feature_maps, split_ae_outputs)
    from ..models.bottomup import get_group_preds
    from ..ops.nms import oks_nms

    if align_corners is None:
        # reference config convention: plain AE configs set
        # align_corners=False, UDP configs True (higherhrnet_w32_*.py:106)
        align_corners = bool(use_udp)

    if isinstance(img, str):
        img = cv2.cvtColor(cv2.imread(img), cv2.COLOR_BGR2RGB)
    img = np.asarray(img)
    info = dataset_info or estimator.dataset_info
    flip_index = (info.flip_index if info is not None
                  else np.arange(estimator.num_joints))
    k = estimator.num_joints
    min_scale = min(test_scale_factor)

    heatmaps_list, tags_list = [], []
    # every scale projects to the CURRENT_SCALE=1 base size, and decode
    # center/scale are evaluated at current_scale=1 too (reference
    # BottomUpGetImgSize, bottom_up_transform.py:706 — NOT the largest
    # scale's canvas, and NOT the per-scale resize's center/scale)
    base_wh, center, scale = get_multi_scale_size(
        img, (base_size, base_size), 1.0, min_scale, use_udp=use_udp)
    for s in sorted(test_scale_factor, reverse=True):
        resized, _, _ = resize_align_multi_scale(
            img, (base_size, base_size), s, min_scale, use_udp=use_udp)
        x = jnp.asarray(resized[None], jnp.float32) / 255.0
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)

        def apply_split(inp):
            """Model output(s) -> (heatmap list, tag list) in NCHW.
            Multi-resolution heads (AEHigherResolutionHead) return a list
            of maps; per-output tag presence follows the head's
            with_ae_loss (reference split_ae_outputs + the higherhrnet
            test_cfg with_heatmaps/with_ae lists)."""
            out = estimator.apply(variables, inp)
            outs = list(out) if isinstance(out, (list, tuple)) else [out]
            outs = [jnp.asarray(o).transpose(0, 3, 1, 2) for o in outs]
            wa = getattr(getattr(estimator, 'head', None),
                         'with_ae_loss', None)
            if isinstance(wa, (list, tuple)) and len(wa) >= len(outs):
                with_ae = list(wa)[:len(outs)]
            else:
                with_ae = [o.shape[1] > k for o in outs]
            # multi-stage (Hourglass-AE) protocol selects only the last
            # stage at test time (reference select_output_index=[3])
            select = ([len(outs) - 1]
                      if getattr(estimator, '_multi_stage', False)
                      else list(range(len(outs))))
            return split_ae_outputs(outs, k, [True] * len(outs), with_ae,
                                    select)

        hms, tags_o = apply_split(x)
        if with_flip:
            hms_f, tags_f = apply_split(x[:, :, ::-1, :])
            hms_f = flip_feature_maps(hms_f, flip_index=flip_index)
            tags_f = flip_feature_maps(tags_f, flip_index=flip_index)
        else:
            hms_f = tags_f = None
        agg_hm = aggregate_stage_flip(
            hms, hms_f, project2image=True,
            size_projected=tuple(base_wh),
            align_corners=align_corners,
            aggregate_stage='average', aggregate_flip='average')[0]
        heatmaps_list.append(agg_hm)
        if s == 1.0 or len(test_scale_factor) == 1:
            # tags participate only at the base scale (reference
            # associative_embedding.py:188-199); stages and flip both
            # concat along L
            tags_list.extend(aggregate_stage_flip(
                tags_o, tags_f, project2image=True,
                size_projected=tuple(base_wh),
                align_corners=align_corners,
                aggregate_stage='concat', aggregate_flip='concat'))
    heatmaps = aggregate_scale(heatmaps_list,
                               align_corners=align_corners)  # [1,K,H,W]
    tags = aggregate_scale(tags_list, align_corners=align_corners,
                           aggregate_scale_mode='unsqueeze_concat')
    results, scores = estimator.parser.parse(
        np.asarray(heatmaps, np.float32), np.asarray(tags, np.float32))
    hh, ww = np.asarray(heatmaps).shape[-2:]
    preds = get_group_preds(results[0], center, scale, (ww, hh),
                            use_udp=use_udp)
    pose_results = [dict(keypoints=np.asarray(p)[:, :3], score=float(sc))
                    for p, sc in zip(preds, scores)]
    for p in pose_results:
        kp = p['keypoints']
        p['area'] = float((kp[:, 0].max() - kp[:, 0].min())
                          * (kp[:, 1].max() - kp[:, 1].min()))
    if pose_results and pose_nms_thr is not None:
        keep = oks_nms(pose_results, pose_nms_thr,
                       sigmas=info.sigmas if info is not None
                       and len(info.sigmas) else None)
        pose_results = [pose_results[i] for i in keep]
    return pose_results, []


def imshow_bboxes(img, bboxes, labels=None, colors=(0, 255, 0), thickness=1,
                  out_file=None):
    """Draw xyxy boxes (+optional labels) on an image (reference
    core/visualization/image.py:27 `imshow_bboxes`). Returns BGR image."""
    import cv2
    if isinstance(img, str):
        img = cv2.imread(img)
    else:
        img = cv2.cvtColor(np.asarray(img), cv2.COLOR_RGB2BGR)
    img = img.copy()
    if isinstance(colors[0], int):
        colors = [colors] * len(bboxes)
    for i, bbox in enumerate(np.asarray(bboxes)):
        x0, y0, x1, y1 = bbox[:4].astype(int)
        cv2.rectangle(img, (x0, y0), (x1, y1), tuple(colors[i]), thickness)
        if labels is not None:
            cv2.putText(img, str(labels[i]), (x0, max(y0 - 2, 0)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, tuple(colors[i]), 1)
    if out_file:
        cv2.imwrite(out_file, img)
    return img


def vis_pose_result_3d(pose_results_3d, skeleton=None, out_file=None,
                       azimuth=70, elevation=15, img=None,
                       kpt_score_thr=0.3, pose_kpt_color=None,
                       pose_link_color=None, axis_limit=1.7, axis_dist=10.0,
                       num_instances=-1):
    """Render 3D poses with matplotlib (reference
    core/visualization/image.py:205 `imshow_keypoints_3d`).

    Mirrors the reference layout: an optional 2D input-image panel on the
    left, then one 3D subplot per pose instance. keypoints_3d may carry a
    4th score column; joints (and links touching them) below
    `kpt_score_thr` are hidden. `pose_kpt_color`/`pose_link_color` take
    [K, 3] / [L, 3] RGB rows (DatasetInfo palettes); `axis_limit` is the
    half-width of the cube around the pose root, `axis_dist` the camera
    distance, `num_instances` pads/truncates the subplot count (-1 = one
    per result).
    """
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    results = list(pose_results_3d)
    if num_instances > 0:
        results = results[:num_instances]
    n_axes = max(1, len(results)) + (1 if img is not None else 0)
    fig = plt.figure(figsize=(3 * n_axes, 3))
    col = 1
    if img is not None:
        ax0 = fig.add_subplot(1, n_axes, 1)
        ax0.imshow(np.asarray(img))
        ax0.axis('off')
        col = 2
    for i, res in enumerate(results):
        ax = fig.add_subplot(1, n_axes, col + i, projection='3d')
        kp = np.asarray(res['keypoints_3d'], np.float32)
        score = kp[:, 3] if kp.shape[1] > 3 else np.ones(len(kp))
        valid = score >= kpt_score_thr
        if pose_kpt_color is not None:
            c = np.asarray(pose_kpt_color, np.float32)[:len(kp)] / 255.0
            ax.scatter(kp[valid, 0], kp[valid, 1], kp[valid, 2], s=8,
                       c=c[valid])
        else:
            ax.scatter(kp[valid, 0], kp[valid, 1], kp[valid, 2], s=8)
        for li, (a, b) in enumerate(skeleton or []):
            # skip links referencing joints outside this pose (e.g. a
            # wholebody skeleton drawn over body-only keypoints)
            if a >= len(kp) or b >= len(kp) or not (valid[a] and valid[b]):
                continue
            lc = None
            if pose_link_color is not None and li < len(pose_link_color):
                lc = np.asarray(pose_link_color[li], np.float32) / 255.0
            ax.plot([kp[a, 0], kp[b, 0]], [kp[a, 1], kp[b, 1]],
                    [kp[a, 2], kp[b, 2]], lw=1,
                    color=tuple(lc) if lc is not None else None)
        # cube around the pose root (reference axes_3d limits)
        root = kp[valid, :3].mean(axis=0) if valid.any() else np.zeros(3)
        ax.set_xlim3d([root[0] - axis_limit, root[0] + axis_limit])
        ax.set_ylim3d([root[1] - axis_limit, root[1] + axis_limit])
        ax.set_zlim3d([root[2] - axis_limit, root[2] + axis_limit])
        # Axes3D.dist was removed in matplotlib 3.8; box-aspect zoom is the
        # closest camera-distance control (reference default axis_dist=10
        # maps to zoom 1)
        ax.set_box_aspect(None, zoom=10.0 / float(axis_dist))
        ax.view_init(elev=elevation, azim=azimuth)
        if 'title' in res:
            ax.set_title(res['title'])
    if out_file:
        fig.savefig(out_file, dpi=100)
        plt.close(fig)
    return fig


def imshow_mesh_3d(img, vertices, faces, camera_center, focal_length,
                   colors=((76, 76, 204),)):
    """Render 3D meshes onto a background image.

    Counterpart of the reference `imshow_mesh_3d`
    (core/visualization/image.py:353), which depends on pyrender/trimesh
    and silently returns the input image when they are missing. This
    implementation is a self-contained numpy z-buffer rasterizer with
    Lambertian flat shading — no GL/renderer dependency.

    Args:
      img: [H, W, 3] uint8 background.
      vertices: list of [V, 3] camera-space vertex arrays in the CV
        convention (x right, y down, z positive in front of the camera) —
        what the reference feeds before its pyrender 180-degree x-flip.
      faces: list of [F, 3] int arrays.
      camera_center: (cx, cy) pixels.
      focal_length: (fx, fy) pixels.
      colors: list of per-mesh (r, g, b).

    Returns: [H, W, 3] uint8 composite.
    """
    import numpy as np
    h, w = img.shape[:2]
    out = img.astype(np.float32).copy()
    zbuf = np.full((h, w), np.inf, np.float32)
    cx, cy = float(camera_center[0]), float(camera_center[1])
    fx, fy = float(focal_length[0]), float(focal_length[1])
    if not isinstance(colors, (list, tuple)) or (
            len(colors) and np.isscalar(colors[0])):
        colors = [colors]
    light = np.array([0.0, 0.0, 1.0], np.float32)

    for mi, (verts, fcs) in enumerate(zip(vertices, faces)):
        v = np.asarray(verts, np.float32)
        z = np.maximum(v[:, 2], 1e-6)          # depth in front of camera
        px = cx + fx * v[:, 0] / z
        py = cy + fy * v[:, 1] / z
        color = np.asarray(colors[mi % len(colors)], np.float32)
        tri = np.asarray(fcs, np.int64)
        p0, p1, p2 = px[tri[:, 0]], px[tri[:, 1]], px[tri[:, 2]]
        q0, q1, q2 = py[tri[:, 0]], py[tri[:, 1]], py[tri[:, 2]]
        z0, z1, z2 = z[tri[:, 0]], z[tri[:, 1]], z[tri[:, 2]]
        # flat normals for shading
        e1 = v[tri[:, 1]] - v[tri[:, 0]]
        e2 = v[tri[:, 2]] - v[tri[:, 0]]
        nrm = np.cross(e1, e2)
        nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-9)
        shade = 0.5 + 0.5 * np.abs(nrm @ light)
        for t in range(len(tri)):
            xmin = max(int(np.floor(min(p0[t], p1[t], p2[t]))), 0)
            xmax = min(int(np.ceil(max(p0[t], p1[t], p2[t]))) + 1, w)
            ymin = max(int(np.floor(min(q0[t], q1[t], q2[t]))), 0)
            ymax = min(int(np.ceil(max(q0[t], q1[t], q2[t]))) + 1, h)
            if xmin >= xmax or ymin >= ymax:
                continue
            xs, ys = np.meshgrid(np.arange(xmin, xmax),
                                 np.arange(ymin, ymax))
            d = ((q1[t] - q2[t]) * (p0[t] - p2[t])
                 + (p2[t] - p1[t]) * (q0[t] - q2[t]))
            if abs(d) < 1e-9:
                continue
            l0 = ((q1[t] - q2[t]) * (xs - p2[t])
                  + (p2[t] - p1[t]) * (ys - q2[t])) / d
            l1 = ((q2[t] - q0[t]) * (xs - p2[t])
                  + (p0[t] - p2[t]) * (ys - q2[t])) / d
            l2 = 1.0 - l0 - l1
            inside = (l0 >= 0) & (l1 >= 0) & (l2 >= 0)
            if not inside.any():
                continue
            depth = l0 * z0[t] + l1 * z1[t] + l2 * z2[t]
            sub = zbuf[ymin:ymax, xmin:xmax]
            upd = inside & (depth < sub)
            sub[upd] = depth[upd]
            region = out[ymin:ymax, xmin:xmax]
            region[upd] = color * shade[t]
    return np.clip(out, 0, 255).astype(np.uint8)

"""3D pose-lifting inference API.

Counterpart of reference mmpose/apis/inference_3d.py:212
`inference_pose_lifter_model` (+ `extract_pose_sequence`): gather a temporal
window of 2D poses per target frame, normalize to image/root-centered
coordinates, run the PoseLifter, and restore global positions.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np


def extract_pose_sequence(pose_results_list, frame_idx, causal=False,
                          seq_len=27, step=1):
    """Collect a padded window of per-frame pose results around frame_idx
    (parity: inference_3d.py `extract_pose_sequence`)."""
    if causal:
        frames_left, frames_right = seq_len - 1, 0
    else:
        frames_left = (seq_len - 1) // 2
        frames_right = seq_len - 1 - frames_left
    num_frames = len(pose_results_list)
    pad_left = max(0, frames_left - frame_idx // step)
    pad_right = max(0, frames_right - (num_frames - 1 - frame_idx) // step)
    start = frame_idx - (frames_left - pad_left) * step
    end = frame_idx + (frames_right - pad_right) * step + 1
    seq = pose_results_list[start:end:step]
    seq = [seq[0]] * pad_left + seq + [seq[-1]] * pad_right
    return seq


def _normalize_sequence(kp_seq, image_size=None):
    """[T, K, C>=2] pixel coords -> normalized coords in [-1, 1]-ish frame
    (reference norm: (x - w/2) / (w/2))."""
    kp = np.asarray(kp_seq, np.float32)[..., :2].copy()
    if image_size is not None:
        w, h = image_size
        kp[..., 0] = (kp[..., 0] - w / 2) / (w / 2)
        kp[..., 1] = (kp[..., 1] - h / 2) / (w / 2)
    return kp


def inference_pose_lifter_model(model, variables, pose_results_2d,
                                image_size=None, with_track_id=True,
                                norm_pose_2d=False, causal=False,
                                bbox_center=(528.0, 427.0),
                                bbox_scale=400.0):
    """Lift a temporal sequence of 2D poses to 3D.

    Args:
      model: vitpose_tpu.models.pose3d.PoseLifter
      pose_results_2d: list over T frames of lists of person dicts with
        'keypoints' [K, 3] (+ optional 'track_id', 'bbox').
      image_size: (w, h) — when given, 2D coords are normalized to the
        VideoPose3D [-1, 1] frame the lifters train on.
      norm_pose_2d: rescale each person's keypoints from its own bbox to
        the dataset's average bbox (reference inference_3d.py:104-110:
        (kp - box_center)/box_scale * bbox_scale + bbox_center) before
        the image normalization; needs 'bbox' ([x1, y1, x2, y2(, s)]) in
        the person dicts. ``bbox_center``/``bbox_scale`` default to the
        reference's H36M stats fallback (inference_3d.py:274-275).
      causal: the window came from extract_pose_sequence(causal=True), so
        the TARGET frame is the last one, not the middle (reference
        inference_3d.py target_idx = -1 when causal).

    Returns: list of dicts with 'keypoints_3d' [K, 3] (and, for with_traj
    lifters, 'traj' [1, 3]) for each person of the target frame.
    """
    import jax.numpy as jnp

    t_len = model.receptive_field
    assert len(pose_results_2d) == t_len, \
        f'need a {t_len}-frame window, got {len(pose_results_2d)}'
    target_idx = -1 if causal else len(pose_results_2d) // 2
    center = pose_results_2d[target_idx]

    def renorm(person, kp):
        if not norm_pose_2d:
            return kp
        if 'bbox' not in person:
            raise KeyError('norm_pose_2d=True needs a bbox per person '
                           '(reference _gather_pose_lifter_inputs)')
        b = np.asarray(person['bbox'], np.float32)
        c = np.array([(b[0] + b[2]) / 2, (b[1] + b[3]) / 2], np.float32)
        s = max(b[2] - b[0], b[3] - b[1])
        out = kp.copy()
        out[:, :2] = (kp[:, :2] - c) / s * bbox_scale \
            + np.asarray(bbox_center, np.float32)
        return out

    results = []
    for person in center:
        tid = person.get('track_id', None)
        seq = []
        for frame in pose_results_2d:
            match = None
            if with_track_id and tid is not None:
                for p in frame:
                    if p.get('track_id') == tid:
                        match = p
                        break
            if match is None and frame:
                match = frame[0]
            src = match if match is not None else person
            seq.append(renorm(src, np.asarray(src['keypoints'],
                                              np.float32)))
        kp = _normalize_sequence(np.stack(seq), image_size)
        out = model.apply(variables, jnp.asarray(kp)[None], train=False)
        res = dict(person)
        if isinstance(out, tuple):
            # with_traj lifter: (pose, traj) — keep the global root too
            pose3d, traj = out
            res['keypoints_3d'] = np.asarray(pose3d)[0]
            res['traj'] = np.asarray(traj)[0]
        else:
            res['keypoints_3d'] = np.asarray(out)[0]
        results.append(res)
    return results


def _as_est_variables(model):
    """Accept an (estimator, variables) pair or an object exposing them."""
    if isinstance(model, (tuple, list)) and len(model) == 2:
        return model[0], model[1]
    return model.est if hasattr(model, 'est') else model.mesh, \
        model.variables


def _select_boxes(det_results, bbox_thr, fmt):
    from ..ops.geometry import bbox_xyxy2xywh
    if len(det_results) == 0:      # person-free frame: nothing to stack
        empty = np.zeros((0, 5), np.float32)
        return empty, empty.copy(), np.zeros(0, np.int64)
    bboxes = np.stack([
        np.pad(np.asarray(p['bbox'], np.float32)[:5],
               (0, max(0, 5 - len(np.asarray(p['bbox'])[:5]))),
               constant_values=1.0) for p in det_results])
    if fmt == 'xyxy':
        xyxy = bboxes.copy()
        bboxes = np.asarray(bbox_xyxy2xywh(bboxes))
    else:
        xyxy = bboxes.copy()
        xyxy[:, 2] = bboxes[:, 0] + bboxes[:, 2]
        xyxy[:, 3] = bboxes[:, 1] + bboxes[:, 3]
    keep = np.arange(len(bboxes)) if bbox_thr is None else \
        np.where(bboxes[:, 4] > bbox_thr)[0]
    return bboxes, xyxy, keep


def _crop_normalized(img, bboxes_xywh, out_size, padding=1.25):
    """Host image + xywh boxes -> normalized crops [N, h, w, 3] plus the
    (center, scale) pair needed for decode, using the same golden-tested
    affine warp as the training pipeline."""
    import jax.numpy as jnp
    from ..ops.geometry import bbox_xywh2cs, affine_matrix
    from ..ops.warp import warp_affine_batch

    w, h = out_size
    center, scale = bbox_xywh2cs(bboxes_xywh[:, :4], w / h, padding=padding)
    center = np.asarray(center, np.float32)
    scale = np.asarray(scale, np.float32)
    n = len(bboxes_xywh)
    # img/255 only — the interhand/mesh training loops and eval
    # (train/interhand_loop.py, data/mesh.py MeshAdvLoader,
    # eval/families.py) all feed plain /255 inputs, so the serving API
    # must match that distribution (no ImageNet mean/std here)
    imgs = jnp.broadcast_to(
        jnp.asarray(img, jnp.float32)[None] / 255.0, (n,) + img.shape)
    mat = affine_matrix(center, scale, jnp.zeros(n), (w, h))
    crops = warp_affine_batch(imgs, mat, (w, h))
    return crops, center, scale


def inference_interhand_3d_model(model, img_or_path, det_results,
                                 bbox_thr=None, format='xywh',
                                 dataset='interhand3d'):
    """Inference interacting-hand 3D pose for a list of hand boxes
    (counterpart of reference apis/inference_3d.py:469).

    Args:
      model: an ``Interhand3DEstimator`` with its variables — either an
        object exposing ``.est``/``.variables`` or an ``(est, variables)``
        pair.
      det_results: list of {'bbox': [x, y, w, h(, score)]} dicts.

    Returns a list of the input dicts extended with 'keypoints_3d'
    [K, 4] (x, y, root-relative depth mm, score·hand-type-prob) and the
    xyxy 'bbox' — matching the reference's packing: relative root depth
    added to left-hand z, per-hand scores gated by the hand-type
    classifier.
    """
    assert format in ('xyxy', 'xywh')
    if len(det_results) == 0:
        return []
    est, variables = _as_est_variables(model)
    bboxes, xyxy, keep = _select_boxes(det_results, bbox_thr, format)
    if len(keep) == 0:
        return []
    ih, iw = est.backbone.cfg.img_size

    if isinstance(img_or_path, str):
        import cv2
        img = cv2.cvtColor(cv2.imread(img_or_path), cv2.COLOR_BGR2RGB)
    else:
        img = np.asarray(img_or_path)

    crops, center, scale = _crop_normalized(img, bboxes[keep], (iw, ih))
    hm3d, root_logits, type_logits = est.infer(variables, crops)
    res = est.decode(hm3d, root_logits, type_logits, center, scale)

    kp = np.asarray(res['keypoints_3d'], np.float64)       # [N, K, 3]
    scores = np.asarray(res['scores'], np.float64)          # [N, K, 1]
    half = kp.shape[1] // 2
    kp[:, half:, 2] += np.asarray(res['rel_root_depth'])[:, None]
    scores[:, :half, 0] *= res['hand_type'][:, [0]]
    scores[:, half:, 0] *= res['hand_type'][:, [1]]
    poses = np.concatenate([kp, scores], axis=-1)

    out = []
    for row, i in enumerate(keep):
        r = dict(det_results[i])
        r['keypoints_3d'] = poses[row]
        r['bbox'] = xyxy[i, :4]
        r['rel_root_depth'] = float(res['rel_root_depth'][row])
        r['hand_type'] = res['hand_type'][row]
        out.append(r)
    return out


def inference_mesh_model(model, img_or_path, det_results, bbox_thr=None,
                         format='xywh', image_size=(224, 224), faces=None):
    """SMPL mesh recovery for a list of person boxes (counterpart of
    reference apis/inference_3d.py:621).

    Args:
      model: a ``ParametricMesh`` with its variables — an object exposing
        ``.mesh``/``.variables`` (optionally ``.faces``) or a
        ``(mesh, variables)`` pair (pass ``faces=`` explicitly then).

    Returns the input dicts extended with 'keypoints_3d', 'camera',
    'vertices', 'faces', 'center', 'scale' and the xyxy 'bbox'.
    """
    import jax.numpy as jnp
    assert format in ('xyxy', 'xywh')
    if len(det_results) == 0:
        return []
    mesh, variables = _as_est_variables(model)
    faces = faces if faces is not None else getattr(model, 'faces', None)
    bboxes, xyxy, keep = _select_boxes(det_results, bbox_thr, format)
    if len(keep) == 0:
        return []

    if isinstance(img_or_path, str):
        import cv2
        img = cv2.cvtColor(cv2.imread(img_or_path), cv2.COLOR_BGR2RGB)
    else:
        img = np.asarray(img_or_path)

    crops, center, scale = _crop_normalized(img, bboxes[keep], image_size)
    out_m = mesh.apply(variables, jnp.asarray(crops))

    results = []
    for row, i in enumerate(keep):
        r = dict(det_results[i])
        r['bbox'] = xyxy[i, :4]
        r['center'] = center[row]
        r['scale'] = scale[row]
        r['keypoints_3d'] = np.asarray(out_m['joints_3d'][row])
        r['camera'] = np.asarray(out_m['cam'][row])
        r['vertices'] = np.asarray(out_m['vertices'][row])
        r['faces'] = faces
        results.append(r)
    return results


def vis_3d_pose_result(model, result, img=None, out_file=None,
                       dataset_info=None, kpt_score_thr=0.3, radius=8,
                       thickness=2, num_instances=-1, axis_azimuth=70,
                       axis_elev=15, **kwargs):
    """Reference-named wrapper (apis/inference_3d.py:359) over
    :func:`vitpose_tpu.api.inference.vis_pose_result_3d`. `model` is
    accepted for signature parity; skeleton/colors come from
    `dataset_info` (or the model's, when it has one)."""
    from .inference import vis_pose_result_3d
    info = dataset_info or getattr(model, 'dataset_info', None)
    return vis_pose_result_3d(
        result, skeleton=info.skeleton_links if info else None,
        out_file=out_file, img=img, kpt_score_thr=kpt_score_thr,
        pose_kpt_color=info.keypoint_colors if info else None,
        pose_link_color=info.skeleton_colors if info else None,
        num_instances=num_instances, azimuth=axis_azimuth,
        elevation=axis_elev)


def vis_3d_mesh_result(model, result, img=None, show=False, out_file=None,
                       focal_length=None):
    """Render mesh-recovery results onto the image (counterpart of
    reference apis/inference_3d.py:779 via ParametricMesh.show_result).

    Each result dict needs 'vertices', 'faces', 'camera' and 'bbox'
    (from :func:`inference_mesh_model`). Each person's mesh is placed and
    sized by its own box + weak-perspective scale under one global pinhole
    camera: depth z = 2f / (s * bbox_size), lateral offset so the mesh
    projects into the box center (the reference's per-crop renderer does
    the equivalent with per-person focal 2f/(res*s))."""
    import cv2
    from .inference import imshow_mesh_3d

    if isinstance(img, str):
        img = cv2.imread(img)
    elif img is not None:
        img = cv2.cvtColor(np.asarray(img), cv2.COLOR_RGB2BGR)
    if img is None:
        # headless render: white canvas covering the boxes
        extent = max([int(np.asarray(r['bbox'][:4]).max()) for r in result]
                     + [256])
        img = np.full((extent, extent, 3), 255, np.uint8)
    h, w = img.shape[:2]
    f = focal_length or max(h, w)
    verts, faces = [], []
    for r in result:
        if r.get('faces') is None:
            raise ValueError(
                'result has faces=None — pass faces= to '
                'inference_mesh_model (tuple-form model) or set .faces '
                'on the model object')
        s, tx, ty = np.asarray(r['camera'], np.float64)
        x0, y0, x1, y1 = np.asarray(r['bbox'][:4], np.float64)
        bb = max(x1 - x0, y1 - y0, 1.0)
        cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
        z = 2.0 * f / max(abs(s) * bb, 1e-6)
        v = np.asarray(r['vertices'], np.float64)
        v = v + np.array([tx, ty, 0.0])
        v = v + np.array([(cx - w / 2) * z / f, (cy - h / 2) * z / f, z])
        verts.append(v)
        faces.append(r['faces'])
    rendered = imshow_mesh_3d(img, verts, faces, (w / 2, h / 2), (f, f))
    if out_file:
        cv2.imwrite(out_file, rendered)
    return rendered

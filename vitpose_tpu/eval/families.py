"""Validation routines for the non-top-down model families.

One function per family, shared by ``tools/test.py`` (checkpoint
evaluation) and the family training loops (periodic EvalHook-style
validation — reference core/evaluation/eval_hooks.py:13 applies the
same dataset.evaluate protocol during training). Each takes the config
dict + in-memory variables and returns the dataset's metric dict.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def evaluate_pose_lifter(cfg: dict, model, variables, metric=None):
    """Windowed 2D->3D lifting over the val npz ->
    Body3DH36MDataset.evaluate (MPJPE / P-MPJPE / N-MPJPE). The model
    predicts root-relative poses; predictions are re-anchored at the GT
    root before the root-inclusive comparison (the reference
    root-centers the GT instead — same metric)."""
    import jax.numpy as jnp
    from ..data.body3d import Body3DH36MDataset, load_joint_normalize

    dcfg = cfg['data']
    vcfg = dcfg['val']
    ds = Body3DH36MDataset(vcfg['ann_file'],
                           seq_len=dcfg.get('seq_len', 27),
                           seq_frame_interval=dcfg.get('seq_frame_interval',
                                                       1),
                           causal=dcfg.get('causal', False),
                           det_file=vcfg.get('det_file'),
                           camera_param_file=vcfg.get('camera_param_file'),
                           test_mode=True)
    # SimpleBaseline3D protocol: stats-normalized inputs/targets with the
    # root removed (reference simplebaseline3d_h36m.py + the
    # TemporalRegressionHead decode un-normalization)
    norm2d = load_joint_normalize(cfg.get('joint_2d_normalize'))
    norm3d = load_joint_normalize(cfg.get('joint_3d_normalize'))
    remove_root = bool(cfg['model'].get('remove_root'))
    bs = dcfg.get('batch_size', 128)
    results = []
    for start in range(0, len(ds), bs):
        samples = [ds[i] for i in range(start, min(start + bs, len(ds)))]
        if norm2d is not None:
            x = jnp.stack([(jnp.asarray(s['input_2d'])
                            - norm2d[0]) / norm2d[1] for s in samples])
        else:
            x = jnp.stack([jnp.asarray(ds.normalize_2d(
                s['input_2d'], s['target_idx'])) for s in samples])
        out = model.apply(variables, x, train=False)
        if isinstance(out, tuple):        # with_traj -> (pose, traj)
            out = out[0]
        out = np.asarray(out)
        if norm3d is not None:
            out = out * norm3d[1] + norm3d[0]
        if remove_root:
            # the restored root coincides with the GT root position
            out = np.concatenate(
                [np.zeros((out.shape[0], 1, 3), out.dtype), out], axis=1)
        roots = np.stack([np.asarray(s['target_3d'])[:1] for s in samples])
        results.append(dict(preds=out + roots,
                            target_idxs=[s['target_idx']
                                         for s in samples]))
    metric = metric or cfg.get('evaluation', {}).get('metric', ['mpjpe'])
    return ds.evaluate(results, metric=metric)


def evaluate_mesh(cfg: dict, model, variables, metric=None):
    """HMR inference over the val MeshDataset -> joint_error protocol
    (reference MeshH36MDataset, mesh_h36m_dataset.py:31: 14 LSP joints,
    pelvis-centred MPJPE / MPJPE-PA in mm)."""
    import cv2
    import jax.numpy as jnp
    from ..data.mesh import MeshDataset
    from ..ops.geometry import affine_matrix

    if 'gen' in variables:   # adversarial loop state {'gen', 'disc'}
        variables = variables['gen']
    dcfg = cfg['data']
    vcfg = dcfg['val']
    image_size = tuple(dcfg.get('image_size', (224, 224)))
    iw, ih = image_size
    ds = MeshDataset(vcfg['ann_file'], vcfg.get('img_prefix', ''),
                     image_size=image_size)
    bs = dcfg.get('batch_size', 32)
    results = []
    for start in range(0, len(ds), bs):
        recs = ds.db[start:start + bs]
        crops = []
        for rec in recs:
            img = cv2.cvtColor(cv2.imread(rec['image_file']),
                               cv2.COLOR_BGR2RGB)
            mat = np.asarray(affine_matrix(
                rec['center'][None], rec['scale'][None],
                np.zeros((1,), np.float32), (iw, ih)))[0]
            crops.append(cv2.warpAffine(img.astype(np.float32), mat,
                                        (iw, ih), flags=cv2.INTER_LINEAR))
        out = model.apply(variables,
                          jnp.asarray(np.stack(crops) / 255.0,
                                      jnp.float32),
                          train=False)
        results.append(dict(keypoints_3d=np.asarray(out['joints_3d']),
                            image_path=[r['image_file'] for r in recs]))
    metric = metric or cfg.get('evaluation', {}).get('metric',
                                                     'joint_error')
    return ds.evaluate(results, metric=metric)


def evaluate_posewarper(cfg: dict, model, variables,
                        batch_size: Optional[int] = None,
                        res_folder: Optional[str] = None, metric=None):
    """Frame windows (key frame first) -> temporal-aggregation forward
    (optional flip test per cfg.test_cfg) -> heatmap decode ->
    PoseTrack poseval-style mAP (reference posewarper.py forward_test +
    topdown_posetrack18_video_dataset.py evaluate)."""
    import jax.numpy as jnp
    from ..data.posetrack import PoseTrackVideoDataset
    from ..ops.decode import keypoints_from_heatmaps
    from ..train.posewarper_loop import load_window

    dcfg = cfg['data']
    vcfg = dcfg['val']
    image_size = tuple(dcfg.get('image_size', (288, 384)))
    heatmap_size = tuple(dcfg.get('heatmap_size', (72, 96)))
    bbox_file = vcfg.get('bbox_file')
    ds = PoseTrackVideoDataset(
        vcfg['ann_file'], vcfg.get('img_prefix', ''),
        image_size=image_size, heatmap_size=heatmap_size,
        frame_indices_test=list(dcfg.get('frame_indices',
                                         (-2, -1, 0, 1, 2))),
        test_mode=True, use_gt_bbox=bbox_file is None,
        bbox_file=bbox_file,
        det_bbox_thr=dcfg.get('det_bbox_thr', 0.0))
    bs = batch_size or dcfg.get('batch_size', 8)
    tcfg = cfg.get('test_cfg', {})
    post = tcfg.get('post_process', 'default')
    results = []
    for start in range(0, len(ds), bs):
        recs = ds.db[start:start + bs]
        frames, centers, scales = [], [], []
        for rec in recs:
            f, _, _, c, s = load_window(rec, image_size, rng=None)
            frames.append(f)
            centers.append(c)
            scales.append(s)
        fw = jnp.asarray(recs[0]['frame_weight'])
        x = jnp.asarray(np.stack(frames))
        heat = model.apply(variables, x, train=False, frame_weight=fw,
                           key_index=0)
        if tcfg.get('flip_test', False):
            # reference PoseWarper.forward_test flip-test averaging
            # (posewarper.py:169-199, 1px shift_heatmap)
            hm_f = model.apply(variables, x[:, :, :, ::-1, :],
                               train=False, frame_weight=fw, key_index=0)
            hm_f = hm_f[:, jnp.asarray(ds.info.flip_index)][..., ::-1]
            if tcfg.get('shift_heatmap', True):
                hm_f = hm_f.at[..., 1:].set(hm_f[..., :-1])
            heat = (heat + hm_f) * 0.5
        heat = np.asarray(heat, np.float32)
        c = np.stack(centers)
        s = np.stack(scales)
        preds, maxvals = keypoints_from_heatmaps(
            heat, c, s, post_process=post)
        kp = np.concatenate([np.asarray(preds), np.asarray(maxvals)],
                            axis=-1)
        area = np.prod(s * 200.0, axis=1, keepdims=True)
        boxes = np.concatenate(
            [c, s, area,
             np.asarray([[r['bbox_score']] for r in recs])], axis=1)
        results.append(dict(
            preds=kp, boxes=boxes,
            image_paths=[r['image_file'] for r in recs],
            bbox_ids=[r['bbox_id'] for r in recs]))
    metric = metric or cfg.get('evaluation', {}).get('metric', 'mAP')
    return ds.evaluate(results, res_folder=res_folder, metric=metric)


def evaluate_interhand3d(cfg: dict, model, variables, metric=None):
    """Per-crop 2.5D inference -> decode -> camera-space backprojection
    -> InterHandDataset.evaluate (MPJPE / MRRPE / Handedness_acc /
    AUC)."""
    from ..train.interhand_loop import InterHandLoader
    from ..data.interhand import InterHandDataset
    from ..models.interhand3d import backproject_to_camera
    from ..ops.geometry import bbox_xywh2cs

    dcfg = cfg['data']
    vcfg = dcfg['val']
    ds = InterHandDataset(vcfg['ann_file'], vcfg['camera_file'],
                          vcfg['joint_file'],
                          img_prefix=vcfg.get('img_prefix', ''))
    loader = InterHandLoader(ds, dcfg.get('batch_size', 16),
                             image_size=tuple(dcfg.get('image_size',
                                                       (256, 256))),
                             is_train=False)
    w, h = loader.image_size
    results = []
    n = len(ds.db)
    for start in range(0, n, loader.batch_size):
        idxs = list(range(start, min(start + loader.batch_size, n)))
        crops = np.stack([loader._prepare(ds.db[i])[0] for i in idxs])
        out = model.infer(variables, crops)
        centers, scales = zip(*[bbox_xywh2cs(ds.db[i]['bbox'],
                                             aspect_ratio=w / h)
                                for i in idxs])
        dec = model.decode(out[0], out[1], out[2],
                           np.stack(centers), np.stack(scales))
        focal = np.stack([ds.db[i]['focal'] for i in idxs])
        princpt = np.stack([ds.db[i]['princpt'] for i in idxs])
        abs_depth = np.stack([ds.db[i]['abs_depth'] for i in idxs])
        cam = backproject_to_camera(dec['keypoints_3d'], focal, princpt,
                                    abs_depth)
        results.append(dict(preds=cam, hand_type=dec['hand_type'],
                            keypoints_px=dec['keypoints_3d'],
                            rel_root_depth=dec['rel_root_depth'],
                            bbox_ids=[ds.db[i]['bbox_id'] for i in idxs]))
    metric = metric or cfg.get('evaluation', {}).get('metric', ['MPJPE'])
    return ds.evaluate(results, metric=metric)


def evaluate_voxelpose(cfg: dict, model, variables, metric=None):
    """Per-frame multiview 3D inference -> PanopticMviewDataset.evaluate
    (reference mAP@25-150mm / MPJPE protocol). The 2D heatmaps come from
    the GT-projection painter (the frozen-2D-backbone regime the train
    loop uses); swap in a real 2D model by extending
    train/voxelpose_loop.gt_projected_heatmaps."""
    import jax.numpy as jnp
    from ..data.panoptic_mview import PanopticMviewDataset
    from ..train.voxelpose_loop import gt_projected_heatmaps

    dcfg = cfg['data']
    vcfg = dcfg.get('val', dcfg.get('train', {}))
    ds = PanopticMviewDataset(
        [str(p) for p in vcfg['seq_dirs']],
        cam_names=vcfg.get('cam_names'),
        num_joints=cfg['model'].get('num_joints', 15))
    hm_size = tuple(dcfg.get('heatmap_size', (64, 64)))[::-1]
    from ..train.voxelpose_loop import heatmap_frame_cameras
    results = []
    for idx in range(len(ds)):
        frame = ds[idx]
        # same heatmap-pixel camera frame as training
        cameras = heatmap_frame_cameras(frame['cameras'], hm_size)
        heatmaps = gt_projected_heatmaps(frame, cameras,
                                         model.num_joints, hm_size)
        people = model.forward(variables, jnp.asarray(heatmaps), cameras)
        results.append([(np.asarray(j), float(s)) for j, s in people])
    metric = metric or cfg.get('evaluation', {}).get('metric', ['mpjpe'])
    metric = [m if m in ('mpjpe', 'mAP') else
              {'MPJPE': 'mpjpe'}.get(m, m) for m in (
                  metric if isinstance(metric, list) else [metric])]
    return ds.evaluate(results, metric=metric)

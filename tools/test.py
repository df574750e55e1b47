#!/usr/bin/env python
"""Evaluation CLI (counterpart of reference tools/test.py).

Usage:
  python tools/test.py CONFIG CHECKPOINT [--cfg-options ...]
      [--out results.json]

CHECKPOINT may be a torch .pth (converted on the fly) or an .npz from
save_params_npz (for orbax training checkpoints, resume via tools/train.py
or export them with save_params_npz first).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

# honor JAX_PLATFORMS even when a sitecustomize pre-imported jax with a
# different platform baked in
if os.environ.get('JAX_PLATFORMS'):
    import jax
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])


def load_variables(checkpoint, model_cfg, backbone_type='vit',
                   num_units=4, use_prm=False):
    import jax
    import jax.numpy as jnp
    if checkpoint.endswith('.pth'):
        if backbone_type == 'vit':
            from vitpose_tpu.utils.torch_ckpt import (
                convert_topdown_checkpoint)
            v = convert_topdown_checkpoint(checkpoint, model_cfg)
        else:
            from vitpose_tpu.utils.cnn_ckpt import (
                convert_generic_topdown_checkpoint)
            v = convert_generic_topdown_checkpoint(checkpoint,
                                                   backbone_type,
                                                   num_units=num_units,
                                                   use_prm=use_prm)
    elif checkpoint.endswith('.npz'):
        from vitpose_tpu.utils.checkpoint import load_params_npz
        v = load_params_npz(checkpoint)
    else:
        raise ValueError(f'unsupported checkpoint {checkpoint}; for orbax '
                         'dirs use tools/train.py --resume instead')
    return jax.tree.map(jnp.asarray, v)


def build_eval_objects(cfg, batch_size=None, shard_by_process=False):
    """Model + val dataset + loader from a config (shared with
    tools/test_new.py so the dataset/loader wiring lives in ONE place).

    shard_by_process=True splits the val set over jax processes (the
    reference multi_gpu_test path); merge the per-process results with
    vitpose_tpu.eval.loop.collect_results before evaluate()."""
    import jax
    from vitpose_tpu.train.loop import build_model_from_cfg
    from vitpose_tpu.data import topdown_dataset_cls
    from vitpose_tpu.data.loader import TopDownLoader

    model = build_model_from_cfg(cfg['model'])
    dcfg = cfg['data']
    name = dcfg.get('dataset', 'coco')
    ds = topdown_dataset_cls(name)(
        dcfg['val']['ann_file'], dcfg['val']['img_prefix'],
        dataset_info=name,
        image_size=tuple(dcfg['image_size']),
        heatmap_size=tuple(dcfg['heatmap_size']),
        test_mode=True, use_gt_bbox=dcfg['val'].get('use_gt_bbox', True),
        bbox_file=dcfg['val'].get('bbox_file'))
    shard = dict(process_index=jax.process_index(),
                 process_count=jax.process_count()) \
        if shard_by_process else {}
    loader = TopDownLoader(
        ds, batch_size or dcfg.get('batch_size', 64), is_train=False,
        canvas_size=dcfg.get('canvas_size'),
        num_workers=dcfg.get('num_workers', 8), **shard)
    return model, ds, loader


def run_bottomup_eval(cfg, args):
    """Bottom-up eval path (reference tools/test.py handles every family
    through the same CLI): grouped-people inference per val image ->
    BottomUpCocoDataset.evaluate mAP."""
    import numpy as np
    from vitpose_tpu.train.loop import build_model_from_cfg
    from vitpose_tpu.data.bottomup import BottomUpCocoDataset
    from vitpose_tpu.api.inference import inference_bottom_up_pose_model

    model = build_model_from_cfg(cfg['model'])
    if args.checkpoint.endswith('.npz'):
        from vitpose_tpu.utils.checkpoint import load_params_npz
        variables = load_params_npz(args.checkpoint)
    else:
        raise ValueError('bottom-up eval expects an .npz checkpoint '
                         '(save_params_npz from the bottomup train loop)')
    dcfg = cfg['data']
    vcfg = dcfg['val']
    ds = BottomUpCocoDataset(vcfg['ann_file'], vcfg.get('img_prefix', ''),
                             dataset_info=dcfg.get('dataset', 'coco'),
                             input_size=dcfg.get('base_size', 512),
                             test_mode=True)
    results = []
    for idx in range(len(ds)):
        rec = ds.record(idx)
        pose_results, _ = inference_bottom_up_pose_model(
            model, variables, rec['image_file'],
            base_size=dcfg.get('base_size', 512))
        results.append(dict(
            preds=[p['keypoints'] for p in pose_results],
            scores=[p['score'] for p in pose_results],
            image_paths=[rec['image_file']]))
    stats = ds.evaluate(results)
    print(json.dumps({k: float(v) for k, v in stats.items()}, indent=2))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump({k: float(v) for k, v in stats.items()}, f)


def run_interhand_eval(cfg, args):
    """InterHand3D eval path: per-crop 2.5D inference -> decode ->
    camera-space backprojection -> InterHandDataset.evaluate (MPJPE /
    MRRPE / Handedness_acc / AUC)."""
    import numpy as np
    from vitpose_tpu.train.loop import build_model_from_cfg
    from vitpose_tpu.train.interhand_loop import InterHandLoader
    from vitpose_tpu.data.interhand import InterHandDataset
    from vitpose_tpu.models.interhand3d import backproject_to_camera

    model = build_model_from_cfg(cfg['model'])
    if not args.checkpoint.endswith('.npz'):
        raise ValueError('interhand3d eval expects an .npz checkpoint '
                         '(work_dir/final.npz from tools/train.py)')
    from vitpose_tpu.utils.checkpoint import load_params_npz
    variables = load_params_npz(args.checkpoint)
    dcfg = cfg['data']
    vcfg = dcfg['val']
    ds = InterHandDataset(vcfg['ann_file'], vcfg['camera_file'],
                          vcfg['joint_file'],
                          img_prefix=vcfg.get('img_prefix', ''))
    loader = InterHandLoader(ds, dcfg.get('batch_size', 16),
                             image_size=tuple(dcfg.get('image_size',
                                                       (256, 256))),
                             is_train=False)
    from vitpose_tpu.ops.geometry import bbox_xywh2cs
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
                            bbox_ids=[ds.db[i]['bbox_id'] for i in idxs]))
    metric = args.metric or cfg.get('evaluation', {}).get(
        'metric', ['MPJPE'])
    stats = ds.evaluate(results, metric=metric)
    print(json.dumps({k: float(v) for k, v in stats.items()}, indent=2))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump({k: float(v) for k, v in stats.items()}, f)


def run_pose_lifter_eval(cfg, args):
    """PoseLifter eval path: windowed 2D->3D lifting over the val npz ->
    Body3DH36MDataset.evaluate (MPJPE / P-MPJPE / N-MPJPE). The model
    predicts root-relative poses; predictions are re-anchored at the GT
    root before the root-inclusive comparison (the reference root-centers
    the GT instead — same metric)."""
    import numpy as np
    import jax.numpy as jnp
    from vitpose_tpu.train.loop import build_model_from_cfg
    from vitpose_tpu.data.body3d import Body3DH36MDataset

    model = build_model_from_cfg(cfg['model'])
    if not args.checkpoint.endswith('.npz'):
        raise ValueError('pose_lifter eval expects an .npz checkpoint '
                         '(work_dir/final.npz from tools/train.py)')
    from vitpose_tpu.utils.checkpoint import load_params_npz
    variables = load_params_npz(args.checkpoint)
    dcfg = cfg['data']
    ds = Body3DH36MDataset(dcfg['val']['ann_file'],
                           seq_len=dcfg.get('seq_len', 27),
                           causal=dcfg.get('causal', False),
                           test_mode=True)
    bs = dcfg.get('batch_size', 128)
    results = []
    for start in range(0, len(ds), bs):
        idxs = list(range(start, min(start + bs, len(ds))))
        x = jnp.stack([jnp.asarray(ds[i]['input_2d'])
                       for i in idxs]) / 1000.0
        out = np.asarray(model.apply(variables, x, train=False))
        roots = np.stack([np.asarray(ds[i]['target_3d'])[:1]
                          for i in idxs])
        results.append(dict(preds=out + roots,
                            target_idxs=[ds[i]['target_idx']
                                         for i in idxs]))
    metric = args.metric or cfg.get('evaluation', {}).get(
        'metric', ['mpjpe'])
    stats = ds.evaluate(results, metric=metric)
    print(json.dumps({k: float(v) for k, v in stats.items()}, indent=2))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump({k: float(v) for k, v in stats.items()}, f)


def run_posewarper_eval(cfg, args):
    """PoseWarper eval path: 5-frame windows (key frame first,
    reference TopDownPoseTrack18VideoDataset test indices) -> temporal
    aggregation forward -> heatmap decode -> PoseTrack poseval-style
    mAP (posewarper.py forward_test + topdown_posetrack18_video_dataset
    evaluate)."""
    import numpy as np
    import jax.numpy as jnp
    from vitpose_tpu.train.loop import build_model_from_cfg
    from vitpose_tpu.train.posewarper_loop import load_window
    from vitpose_tpu.data.posetrack import PoseTrackVideoDataset
    from vitpose_tpu.ops.decode import keypoints_from_heatmaps

    model = build_model_from_cfg(cfg['model'])
    if not args.checkpoint.endswith('.npz'):
        raise ValueError('posewarper eval expects an .npz checkpoint '
                         '(work_dir/final.npz from tools/train.py)')
    from vitpose_tpu.utils.checkpoint import load_params_npz
    variables = load_params_npz(args.checkpoint)
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
    bs = args.batch_size or dcfg.get('batch_size', 8)
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
    stats = ds.evaluate(results, res_folder=args.tmpdir)
    print(json.dumps({k: float(v) for k, v in stats.items()}, indent=2))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump({k: float(v) for k, v in stats.items()}, f)


def run_mesh_eval(cfg, args):
    """Mesh eval path: HMR inference over the val MeshDataset ->
    MeshDataset.evaluate (reference MeshH36MDataset joint_error
    protocol: 14 LSP joints, pelvis-centred MPJPE / MPJPE-PA in mm,
    mesh_h36m_dataset.py:31)."""
    import cv2
    import numpy as np
    import jax.numpy as jnp
    from vitpose_tpu.train.loop import build_model_from_cfg
    from vitpose_tpu.data.mesh import MeshDataset
    from vitpose_tpu.ops.geometry import affine_matrix

    model = build_model_from_cfg(cfg['model'])
    if not args.checkpoint.endswith('.npz'):
        raise ValueError('mesh eval expects an .npz checkpoint '
                         '(work_dir/final.npz from tools/train.py)')
    from vitpose_tpu.utils.checkpoint import load_params_npz
    variables = load_params_npz(args.checkpoint)
    if 'gen' in variables:  # adversarial loop saves {'gen', 'disc'}
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
                          jnp.asarray(np.stack(crops) / 255.0, jnp.float32),
                          train=False)
        results.append(dict(keypoints_3d=np.asarray(out['joints_3d']),
                            image_path=[r['image_file'] for r in recs]))
    stats = ds.evaluate(results)
    print(json.dumps({k: float(v) for k, v in stats.items()}, indent=2))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump({k: float(v) for k, v in stats.items()}, f)


def run_voxelpose_eval(cfg, args):
    """VoxelPose eval path: per-frame multiview 3D inference ->
    PanopticMviewDataset.evaluate (reference mAP@25-150mm / MPJPE
    protocol). The 2D heatmaps come from the GT-projection painter (the
    frozen-2D-backbone regime the train loop uses); swap in a real 2D
    model by extending train/voxelpose_loop.gt_projected_heatmaps."""
    import numpy as np
    import jax.numpy as jnp
    from vitpose_tpu.train.loop import build_model_from_cfg
    from vitpose_tpu.data.panoptic_mview import PanopticMviewDataset
    from vitpose_tpu.train.voxelpose_loop import gt_projected_heatmaps

    model = build_model_from_cfg(cfg['model'])
    if not args.checkpoint.endswith('.npz'):
        raise ValueError('voxelpose eval expects an .npz checkpoint '
                         '(work_dir/final.npz from tools/train.py)')
    from vitpose_tpu.utils.checkpoint import load_params_npz
    variables = load_params_npz(args.checkpoint)
    dcfg = cfg['data']
    vcfg = dcfg.get('val', dcfg.get('train', {}))
    ds = PanopticMviewDataset(
        [str(p) for p in vcfg['seq_dirs']],
        cam_names=vcfg.get('cam_names'),
        num_joints=cfg['model'].get('num_joints', 15))
    hm_size = tuple(dcfg.get('heatmap_size', (64, 64)))[::-1]
    results = []
    for idx in range(len(ds)):
        frame = ds[idx]
        heatmaps = gt_projected_heatmaps(frame, frame['cameras'],
                                         model.num_joints, hm_size)
        people = model.forward(variables, jnp.asarray(heatmaps),
                               frame['cameras'])
        results.append([(np.asarray(j), float(s)) for j, s in people])
    metric = args.metric or cfg.get('evaluation', {}).get(
        'metric', ['mpjpe'])
    metric = [m if m in ('mpjpe', 'mAP') else
              {'MPJPE': 'mpjpe'}.get(m, m) for m in (
                  metric if isinstance(metric, list) else [metric])]
    stats = ds.evaluate(results, metric=metric)
    print(json.dumps({k: float(v) for k, v in stats.items()}, indent=2))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump({k: float(v) for k, v in stats.items()}, f)


def main():
    ap = argparse.ArgumentParser(description='Evaluate a pose model')
    ap.add_argument('config')
    ap.add_argument('checkpoint')
    ap.add_argument('--cfg-options', nargs='*', default=[])
    ap.add_argument('--out', default=None)
    ap.add_argument('--batch-size', type=int, default=None)
    ap.add_argument('--metric', nargs='*', default=None,
                    help="e.g. mAP PCK AUC EPE NME (dataset-dependent)")
    ap.add_argument('--show-dir', default=None,
                    help='save per-image keypoint visualizations here '
                         '(counterpart of the fork tools/test_new.py '
                         'posevis output)')
    ap.add_argument('--tmpdir', default=None,
                    help='shared scratch dir for multi-process result '
                         'gathering (reference tools/test.py --tmpdir)')
    args = ap.parse_args()

    from vitpose_tpu.utils.config import load_config, apply_options
    from vitpose_tpu.eval.loop import run_validation
    from vitpose_tpu.parallel.distributed import init_distributed

    import jax
    init_distributed()   # no-op single-process; SLURM/env contract
    cfg = apply_options(load_config(args.config), args.cfg_options)
    from vitpose_tpu.utils.env import setup_multi_processes
    setup_multi_processes(cfg)   # clamp cv2/OMP fan-out in workers
    if cfg['model'].get('family') == 'bottomup':
        return run_bottomup_eval(cfg, args)
    if cfg['model'].get('family') == 'interhand3d':
        return run_interhand_eval(cfg, args)
    if cfg['model'].get('family') == 'voxelpose':
        return run_voxelpose_eval(cfg, args)
    if cfg['model'].get('family') == 'pose_lifter':
        return run_pose_lifter_eval(cfg, args)
    if cfg['model'].get('family') == 'mesh':
        return run_mesh_eval(cfg, args)
    if cfg['model'].get('family') == 'posewarper':
        return run_posewarper_eval(cfg, args)
    world = jax.process_count()
    model, ds, loader = build_eval_objects(cfg, args.batch_size,
                                           shard_by_process=world > 1)
    variables = load_variables(args.checkpoint, model.cfg,
                               cfg['model'].get('backbone_type', 'vit'),
                               num_units=cfg['model'].get('num_units', 4),
                               use_prm=cfg['model'].get('use_prm', False))

    mcfg = model.cfg
    results = run_validation(model, variables, loader, use_udp=mcfg.use_udp,
                             post_process=mcfg.post_process,
                             modulate_kernel=mcfg.modulate_kernel,
                             target_type=mcfg.target_type,
                             progress=jax.process_index() == 0)
    if world > 1:
        # reference multi_gpu_test: per-rank shards -> rank-0 merge
        from vitpose_tpu.eval.loop import collect_results
        tmpdir = args.tmpdir or os.path.join(
            os.path.dirname(args.out) if args.out else '.',
            '.eval_gather_tmp')
        results = collect_results(results, tmpdir)
        if results is None:       # non-zero ranks are done
            return
    if args.show_dir:
        import numpy as np
        from collections import defaultdict
        from vitpose_tpu.api.inference import vis_pose_result
        from vitpose_tpu.data import DatasetInfo
        os.makedirs(args.show_dir, exist_ok=True)
        img_prefix = str(cfg['data']['val']['img_prefix'])
        info = (ds.info if hasattr(ds, 'info')
                else DatasetInfo.load(cfg['data'].get('dataset', 'coco')))
        by_img = defaultdict(list)
        for r in results:
            for i, path in enumerate(r['image_paths']):
                by_img[path].append(
                    dict(keypoints=np.asarray(r['preds'][i])))
        for path, poses in by_img.items():
            # flatten the path relative to img_prefix so same-named frames
            # in different sequence dirs (posetrack/horse10) don't collide
            rel = path[len(img_prefix):].lstrip('/') \
                if path.startswith(img_prefix) \
                else os.path.basename(path)
            out = os.path.join(args.show_dir, rel.replace('/', '_'))
            vis_pose_result(None, path, poses, dataset_info=info,
                            out_file=out)
        print(f'saved {len(by_img)} visualizations to {args.show_dir}')

    # CLI --metric wins; else the config's evaluation.metric (the
    # face/hand/animal/fashion zoo protocols); else the dataset default
    metric = args.metric or cfg.get('evaluation', {}).get('metric')
    if metric:
        stats = ds.evaluate(results, metric=metric)
    else:
        stats = ds.evaluate(results)
    print(json.dumps({k: float(v) for k, v in stats.items()}, indent=2))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump({k: float(v) for k, v in stats.items()}, f)


if __name__ == '__main__':
    main()

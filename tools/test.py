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
    from vitpose_tpu.api.inference import load_checkpoint_variables
    return load_checkpoint_variables(
        checkpoint,
        dict(backbone_type=backbone_type, num_units=num_units,
             use_prm=use_prm),
        topdown_cfg=model_cfg)


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
        padding=dcfg.get('padding', 1.25),
        num_workers=dcfg.get('num_workers', 8), **shard)
    return model, ds, loader


def run_bottomup_eval(cfg, args):
    """Bottom-up eval path (reference tools/test.py handles every family
    through the same CLI): the reference TEST protocol per val image —
    multi-scale resize-align + flip aggregation + grouping
    (associative_embedding.py:201 forward_test, honoring the config's
    test_scale_factor / use_udp / align_corners) -> dataset evaluate
    (pose NMS only via the dataset's use_nms, never in the API)."""
    import numpy as np
    from vitpose_tpu.train.loop import build_model_from_cfg
    from vitpose_tpu.data.bottomup import BottomUpCocoDataset
    from vitpose_tpu.api.inference import inference_bottom_up_multi_scale

    model = build_model_from_cfg(cfg['model'])
    variables = _load_family_ckpt(args, cfg)
    dcfg = cfg['data']
    vcfg = dcfg['val']
    ds = BottomUpCocoDataset(vcfg['ann_file'], vcfg.get('img_prefix', ''),
                             dataset_info=dcfg.get('dataset', 'coco'),
                             input_size=dcfg.get('base_size', 512),
                             test_mode=True)
    results = []
    for idx in range(len(ds)):
        rec = ds.record(idx)
        pose_results, _ = inference_bottom_up_multi_scale(
            model, variables, rec['image_file'],
            test_scale_factor=tuple(dcfg.get('test_scale_factor', (1.0,))),
            base_size=dcfg.get('input_size', 512),
            use_udp=dcfg.get('use_udp', False),
            pose_nms_thr=None)
        results.append(dict(
            preds=[p['keypoints'] for p in pose_results],
            scores=[p['score'] for p in pose_results],
            image_paths=[rec['image_file']]))
    metric = args.metric or cfg.get('evaluation', {}).get('metric')
    nms_kw = dict(use_nms=vcfg.get('use_nms', False),
                  soft_nms=vcfg.get('soft_nms', False),
                  oks_thr=vcfg.get('oks_thr', 0.9))
    if metric:
        stats = ds.evaluate(results, metric=metric, **nms_kw)
    else:
        stats = ds.evaluate(results, **nms_kw)
    _emit_stats(stats, args)


def run_interhand_eval(cfg, args):
    """InterHand3D eval path (vitpose_tpu.eval.families
    evaluate_interhand3d: 2.5D decode + camera backprojection ->
    MPJPE / MRRPE / Handedness_acc / AUC)."""
    from vitpose_tpu.train.loop import build_model_from_cfg
    from vitpose_tpu.eval.families import evaluate_interhand3d
    model = build_model_from_cfg(cfg['model'])
    stats = evaluate_interhand3d(cfg, model, _load_family_ckpt(args, cfg),
                                 metric=args.metric)
    _emit_stats(stats, args)


def _load_family_ckpt(args, cfg):
    """Family checkpoint: .npz (our tools/train.py export) or torch .pth
    (converted on the fly, like the reference tools/test.py evaluates
    released checkpoints for every family, tools/test.py:87-180)."""
    if args.checkpoint.endswith('.npz'):
        from vitpose_tpu.utils.checkpoint import load_params_npz
        return load_params_npz(args.checkpoint)
    if args.checkpoint.endswith('.pth'):
        from vitpose_tpu.utils.family_ckpt import convert_family_checkpoint
        import jax
        import jax.numpy as jnp
        v = convert_family_checkpoint(args.checkpoint, cfg)
        return jax.tree.map(jnp.asarray, v)
    raise ValueError('family eval expects a .npz (tools/train.py '
                     'work_dir/final.npz) or a torch .pth checkpoint')


def _emit_stats(stats, args):
    print(json.dumps({k: float(v) for k, v in stats.items()}, indent=2))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump({k: float(v) for k, v in stats.items()}, f)


def run_pose_lifter_eval(cfg, args):
    """PoseLifter eval path (vitpose_tpu.eval.families
    evaluate_pose_lifter: windowed 2D->3D lifting -> H36M MPJPE
    protocol)."""
    from vitpose_tpu.train.loop import build_model_from_cfg
    from vitpose_tpu.eval.families import evaluate_pose_lifter
    model = build_model_from_cfg(cfg['model'])
    stats = evaluate_pose_lifter(cfg, model, _load_family_ckpt(args, cfg),
                                 metric=args.metric)
    _emit_stats(stats, args)


def run_posewarper_eval(cfg, args):
    """PoseWarper eval path (vitpose_tpu.eval.families
    evaluate_posewarper: frame windows -> temporal aggregation ->
    decode -> PoseTrack poseval-style mAP)."""
    from vitpose_tpu.train.loop import build_model_from_cfg
    from vitpose_tpu.eval.families import evaluate_posewarper
    model = build_model_from_cfg(cfg['model'])
    stats = evaluate_posewarper(cfg, model, _load_family_ckpt(args, cfg),
                                batch_size=args.batch_size,
                                res_folder=args.tmpdir,
                                metric=args.metric)
    _emit_stats(stats, args)


def run_mesh_eval(cfg, args):
    """Mesh eval path (vitpose_tpu.eval.families evaluate_mesh:
    MeshDataset joint_error protocol — 14-LSP pelvis-centred
    MPJPE / MPJPE-PA in mm)."""
    from vitpose_tpu.train.loop import build_model_from_cfg
    from vitpose_tpu.eval.families import evaluate_mesh
    model = build_model_from_cfg(cfg['model'])
    stats = evaluate_mesh(cfg, model, _load_family_ckpt(args, cfg),
                          metric=args.metric)
    _emit_stats(stats, args)


def run_voxelpose_eval(cfg, args):
    """VoxelPose eval path (vitpose_tpu.eval.families
    evaluate_voxelpose: multiview 3D inference -> panoptic
    mAP@25-150mm / MPJPE protocol)."""
    from vitpose_tpu.train.loop import build_model_from_cfg
    from vitpose_tpu.eval.families import evaluate_voxelpose
    model = build_model_from_cfg(cfg['model'])
    stats = evaluate_voxelpose(cfg, model, _load_family_ckpt(args, cfg),
                               metric=args.metric)
    _emit_stats(stats, args)


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
    ap.add_argument('--int8', action='store_true',
                    help='evaluate through the int8+tanh FAST serving '
                         'path (calibrates static scales on the first '
                         'val batches; measures the AP delta of the '
                         'deployed path — see tests/'
                         'test_int8_ap_neutrality.py for the budget '
                         'methodology)')
    ap.add_argument('--int8-skip', type=int, default=0, metavar='K',
                    help='with --int8: keep the first and last K blocks '
                         'bf16 (selective quantization; the PERF.md '
                         'sweep found K=1 recovers the per-instance OKS '
                         'floor the full-int8 path loses)')
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

    if args.int8:
        # deployed fast path: calibrated W8A8 MLP+qkv + tanh GELU
        # (AP budget methodology: tests/test_int8_ap_neutrality.py)
        import dataclasses
        from vitpose_tpu.utils.quantize import (calibrate_from_loader,
                                                first_last_skip,
                                                int8_serving_config)
        scales = calibrate_from_loader(model, variables, loader,
                                       attn=True)
        fcfg = int8_serving_config(
            model.cfg, scales, qkv=True,
            skip_blocks=first_last_skip(model.cfg.backbone.depth,
                                        args.int8_skip, args.int8_skip))
        fcfg = dataclasses.replace(
            fcfg, backbone=dataclasses.replace(fcfg.backbone,
                                               gelu_approx=True))
        model = type(model)(fcfg)

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
    _emit_stats(stats, args)


if __name__ == '__main__':
    main()

#!/usr/bin/env python
"""Diagnostic evaluation CLI (counterpart of the fork's tools/test_new.py).

Beyond plain `tools/test.py` it mirrors the fork's per-sample diagnostics
(reference tools/test_new.py:244-504): per-annotation OKS matches sorted
worst-first, an OKS histogram png, and GT-vs-prediction overlay images
(GT dashed green, prediction solid with confidence-thresholded markers,
OKS score printed in the corner) for a geometrically-spaced sample of
annotations biased toward the failure cases.

Usage:
  python tools/test_new.py CONFIG CHECKPOINT [--save-dir DIR]
      [--num-images 100 | --draw-all] [--metric mAP] [--out results.json]
"""
import argparse
import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

if os.environ.get('JAX_PLATFORMS'):
    import jax
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

import numpy as np


def _load_test_cli():
    """Reuse tools/test.py's checkpoint loader without shadowing the
    stdlib `test` package."""
    path = os.path.join(os.path.dirname(__file__), 'test.py')
    spec = importlib.util.spec_from_file_location('vitpose_tools_test', path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _draw_pose(img, kpts, skeleton, kpt_color, link_color, kpt_thr=0.0,
               dashed=False, radius=4, thickness=1, markers=True):
    """Draw one pose; `dashed=True` renders the fork's dashed GT style."""
    import cv2
    kpts = np.asarray(kpts, np.float64)
    for idx, (a, b) in enumerate(skeleton):
        if a >= len(kpts) or b >= len(kpts):
            continue
        if kpts[a, 2] <= kpt_thr or kpts[b, 2] <= kpt_thr:
            continue
        p0 = kpts[a, :2]
        p1 = kpts[b, :2]
        color = tuple(int(c) for c in link_color[idx % len(link_color)])
        if dashed:
            length = float(np.hypot(*(p1 - p0)))
            n = max(2, int(length // 8))
            for t in range(0, n, 2):
                q0 = p0 + (p1 - p0) * (t / n)
                q1 = p0 + (p1 - p0) * (min(t + 1, n) / n)
                cv2.line(img, tuple(q0.astype(int)), tuple(q1.astype(int)),
                         color, thickness)
        else:
            cv2.line(img, tuple(p0.astype(int)), tuple(p1.astype(int)),
                     color, thickness)
    if markers:
        for j, (x, y, s) in enumerate(kpts):
            if s <= kpt_thr:
                continue
            color = tuple(int(c) for c in kpt_color[j % len(kpt_color)])
            cv2.circle(img, (int(x), int(y)), radius, color, -1)
    return img


def match_predictions(ds, results):
    """Greedy-match each prediction to its best GT annotation by OKS.

    Counterpart of the fork dataset.evaluate(..., return_score=True)
    sorted_matches: returns a list of (dt_dict, gt_ann, oks) sorted
    ascending by OKS (worst first). Unmatched GTs contribute oks=0 rows
    with dt=None so failure cases never drop out of the sample. Requires
    a COCO-format dataset (ds.coco / ds._path_to_id); returns None for
    list-format datasets (MPII family) so the CLI can skip the
    diagnostics gracefully. Pairing
    is a per-image optimal assignment on the OKS matrix (scipy LAP, the
    same tool ops/group.py uses) rather than score-greedy, so a junk
    detection cannot steal another detection's ground truth.
    """
    from scipy.optimize import linear_sum_assignment

    if not hasattr(ds, 'coco') or not hasattr(ds, '_path_to_id'):
        return None
    from collections import defaultdict
    from vitpose_tpu.eval.cocoeval import compute_oks_matrix

    sigmas = np.asarray(
        ds.sigmas if getattr(ds, 'sigmas', None) is not None
        else np.full(ds.num_joints, 0.05), np.float64)
    by_img = defaultdict(list)
    for r in results:
        preds = np.asarray(r['preds'])
        boxes = np.asarray(r['boxes'])
        for i, path in enumerate(r['image_paths']):
            try:
                # the dataset's own tested path->image_id resolution
                img_id = ds._path_to_id(path)
            except KeyError:
                continue
            by_img[img_id].append({
                'image_id': img_id,
                'keypoints': preds[i].reshape(-1).tolist(),
                'center': boxes[i, 0:2].tolist(),
                'scale': boxes[i, 2:4].tolist(),
                'score': float(boxes[i, 5]),
            })

    matches = []
    for img_id, gts in ds.coco.img_to_anns.items():
        gts = [g for g in gts if not g.get('iscrowd', 0)]
        dts = sorted(by_img.get(img_id, []), key=lambda d: -d['score'])
        if not gts:
            continue
        pairs = {}
        if dts:
            ious = compute_oks_matrix(gts, dts, sigmas)
            rows, cols = linear_sum_assignment(-ious)
            for i, j in zip(rows, cols):
                pairs[int(j)] = (dts[i], float(ious[i, j]))
        for j, gt in enumerate(gts):
            dt, oks = pairs.get(j, (None, 0.0))
            matches.append((dt, gt, oks))
    matches.sort(key=lambda m: m[2])
    return matches


def main():
    ap = argparse.ArgumentParser(
        description='Evaluate a pose model with per-sample OKS diagnostics')
    ap.add_argument('config')
    ap.add_argument('checkpoint')
    ap.add_argument('--cfg-options', nargs='*', default=[])
    ap.add_argument('--out', default=None)
    ap.add_argument('--batch-size', type=int, default=None)
    ap.add_argument('--metric', nargs='*', default=None)
    ap.add_argument('--save-dir', default=None,
                    help='default work_dirs/test_visualization/<config>')
    ap.add_argument('--num-images', type=int, default=100)
    ap.add_argument('--draw-all', action='store_true')
    ap.add_argument('--kpt-thr', type=float, default=0.3)
    ap.add_argument('--per-kpt', action='store_true',
                    help='also print per-keypoint AP sensitivity '
                         '(fork evaluate_per_kpts, '
                         'topdown_coco_dataset.py:391)')
    args = ap.parse_args()

    import cv2
    from vitpose_tpu.utils.config import load_config, apply_options
    from vitpose_tpu.data import DatasetInfo
    from vitpose_tpu.eval.loop import run_validation

    tcli = _load_test_cli()
    cfg = apply_options(load_config(args.config), args.cfg_options)
    model, ds, loader = tcli.build_eval_objects(cfg, args.batch_size)
    name = cfg['data'].get('dataset', 'coco')
    variables = tcli.load_variables(
        args.checkpoint, model.cfg, cfg['model'].get('backbone_type', 'vit'),
        num_units=cfg['model'].get('num_units', 4),
        use_prm=cfg['model'].get('use_prm', False))

    mcfg = model.cfg
    results = run_validation(model, variables, loader, use_udp=mcfg.use_udp,
                             post_process=mcfg.post_process,
                             modulate_kernel=mcfg.modulate_kernel,
                             target_type=mcfg.target_type, progress=True)

    config_name = os.path.splitext(os.path.basename(args.config))[0]
    save_dir = args.save_dir or os.path.join(
        'work_dirs', 'test_visualization', config_name)
    os.makedirs(save_dir, exist_ok=True)

    matches = match_predictions(ds, results)
    if matches is None:
        print('per-sample OKS diagnostics need a COCO-format dataset; '
              f'{type(ds).__name__} is not one — skipping to evaluation')
        matches = []
    oks_list = np.array([m[2] for m in matches])
    print(f'Number of sorted matches: {len(matches)}')

    # OKS histogram (reference test_new.py:289-291)
    if matches:
        try:
            import matplotlib
            matplotlib.use('Agg')
            import matplotlib.pyplot as plt
            plt.figure()
            plt.hist(np.clip(oks_list, 0, 1), bins=100)
            plt.xlabel('OKS')
            plt.ylabel('count')
            plt.savefig(os.path.join(save_dir, 'test_score_histogram.png'))
            plt.close()
        except Exception as e:  # matplotlib is optional at runtime
            print(f'histogram skipped: {e}')

    if args.draw_all or not matches:
        indices = np.arange(len(matches))
    else:
        indices = np.unique(
            (np.geomspace(1, len(matches),
                          num=min(args.num_images, len(matches)))
             - 1).astype(int))

    info = ds.info if hasattr(ds, 'info') else DatasetInfo.load(name)
    skeleton = info.skeleton_links
    kp_colors = info.keypoint_colors
    sk_colors = info.skeleton_colors
    green = [(0, 255, 0)] * max(len(skeleton), ds.num_joints)

    print(f'Drawing {len(indices)} images ({len(matches)} available)')
    drawn = 0
    for i in indices:
        dt, gt, oks = matches[i]
        img_name = ds.id2name[gt['image_id']]
        img_path = os.path.join(str(ds.img_prefix), img_name)
        img = cv2.imread(img_path)
        if img is None:
            continue
        k = ds.num_joints
        gt_kpt = np.asarray(gt['keypoints'], np.float64).reshape(k, 3)
        gt_kpt[:, 2] = (gt_kpt[:, 2] > 0).astype(np.float64)
        img = _draw_pose(img, gt_kpt, skeleton, green, green,
                         dashed=True, markers=False)
        if dt is not None:
            pred_kpt = np.asarray(dt['keypoints'],
                                  np.float64).reshape(k, 3)
            img = _draw_pose(img, pred_kpt, skeleton, kp_colors, sk_colors,
                             kpt_thr=args.kpt_thr)
        cv2.putText(img, f'{oks:.2f}', (10, 30), cv2.FONT_HERSHEY_SIMPLEX,
                    1, (0, 255, 0), 2)
        base, ext = os.path.splitext(os.path.basename(img_name))
        out_path = os.path.join(
            save_dir, f'{i:04d}_vis_{base}-{gt["id"]}.png')
        cv2.imwrite(out_path, img)
        drawn += 1
    print(f'saved {drawn} visualizations to {save_dir}')

    metric = args.metric or cfg.get('evaluation', {}).get('metric')
    stats = ds.evaluate(results, metric=metric) if metric \
        else ds.evaluate(results)
    if args.per_kpt and hasattr(ds, 'evaluate_per_kpts'):
        kpt_names = ds.info.keypoint_names
        for i, per in enumerate(ds.evaluate_per_kpts(results)):
            # sigma_i inflated to 10 -> AP delta shows joint i's influence
            print('{:s} -> {:.1f}'.format(kpt_names[i],
                                          100 * float(per.get('AP', 0.0))))
    for key in sorted(stats):
        print(f'{key}: {stats[key]}')
    if args.out:
        with open(args.out, 'w') as f:
            json.dump({k: float(v) for k, v in stats.items()}, f)


if __name__ == '__main__':
    main()

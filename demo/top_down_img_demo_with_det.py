#!/usr/bin/env python
"""Top-down image demo driven by detector output (counterpart of
reference demo/top_down_img_demo_with_mmdet.py). The sandbox has no
mmdet; any detector's COCO-format detection json works (the same format
as the COCO_val2017_detections bbox files) — or pipe in results from
`process_mmdet_results` when mmdet is importable.

Usage:
  python demo/top_down_img_demo_with_det.py IMG --det-json dets.json
      [--det-cat-id 1] [--bbox-thr 0.3] [--out-img-root vis/]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

if os.environ.get('JAX_PLATFORMS'):
    import jax
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('img')
    ap.add_argument('--det-json', required=True,
                    help='COCO det json: [{image_id, category_id, bbox '
                         '(xywh), score}, ...] or [[x,y,w,h,score], ...]')
    ap.add_argument('--image-id', type=int, default=None,
                    help='filter det entries to this image id')
    ap.add_argument('--det-cat-id', type=int, default=1,
                    help='person category id in the det json')
    ap.add_argument('--bbox-thr', type=float, default=0.3)
    ap.add_argument('--checkpoint', default=None)
    ap.add_argument('--variant', default='b')
    ap.add_argument('--out-img-root', default='vis_results')
    ap.add_argument('--kpt-thr', type=float, default=0.3)
    args = ap.parse_args()

    import cv2
    from vitpose_tpu.api import (init_pose_model,
                                 inference_top_down_pose_model,
                                 vis_pose_result)

    dets = json.load(open(args.det_json))
    person_results = []
    for d in dets:
        if isinstance(d, dict):
            if d.get('category_id', 1) != args.det_cat_id:
                continue
            if (args.image_id is not None
                    and d.get('image_id') != args.image_id):
                continue
            box = list(d['bbox']) + [d.get('score', 1.0)]
        else:
            box = list(d)
        if len(box) > 4 and box[4] < args.bbox_thr:
            continue
        person_results.append({'bbox': box})

    model = init_pose_model(args.variant, checkpoint=args.checkpoint)
    img = cv2.cvtColor(cv2.imread(args.img), cv2.COLOR_BGR2RGB)
    pose_results, _ = inference_top_down_pose_model(
        model, img, person_results, bbox_thr=args.bbox_thr)
    os.makedirs(args.out_img_root, exist_ok=True)
    out = os.path.join(args.out_img_root,
                       'vis_det_' + os.path.basename(args.img))
    vis_pose_result(model, img, pose_results, kpt_score_thr=args.kpt_thr,
                    out_file=out)
    print(f'{len(pose_results)} people -> {out}')


if __name__ == '__main__':
    main()

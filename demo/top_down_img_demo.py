#!/usr/bin/env python
"""Single-image top-down demo (counterpart of reference
demo/top_down_img_demo.py): COCO-json person boxes -> pose -> visualization.

Usage:
  python demo/top_down_img_demo.py IMG --json-file ann.json \
      [--checkpoint ckpt.pth] [--variant s] [--out-img-root vis/]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

# honor JAX_PLATFORMS even when a sitecustomize pre-imported jax with a
# different platform baked in
if os.environ.get('JAX_PLATFORMS'):
    import jax
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('img')
    ap.add_argument('--json-file', default=None,
                    help='COCO json with person bboxes for this image')
    ap.add_argument('--checkpoint', default=None)
    ap.add_argument('--variant', default='s')
    ap.add_argument('--out-img-root', default='vis_results')
    ap.add_argument('--kpt-thr', type=float, default=0.3)
    args = ap.parse_args()

    from vitpose_tpu.api import (init_pose_model,
                                 inference_top_down_pose_model,
                                 vis_pose_result)

    model = init_pose_model(args.variant, checkpoint=args.checkpoint)

    person_results = None
    if args.json_file:
        import json
        with open(args.json_file) as f:
            ann = json.load(f)
        name = os.path.basename(args.img)
        img_ids = {im['file_name']: im['id'] for im in ann['images']}
        if name in img_ids:
            person_results = [
                {'bbox': a['bbox']} for a in ann['annotations']
                if a['image_id'] == img_ids[name]]

    pose_results, _ = inference_top_down_pose_model(
        model, args.img, person_results)
    os.makedirs(args.out_img_root, exist_ok=True)
    out = os.path.join(args.out_img_root,
                       'vis_' + os.path.basename(args.img))
    vis_pose_result(model, args.img, pose_results,
                    kpt_score_thr=args.kpt_thr, out_file=out)
    print(f'{len(pose_results)} persons -> {out}')


if __name__ == '__main__':
    main()

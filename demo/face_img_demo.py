#!/usr/bin/env python
"""Face landmark demo (counterpart of reference demo/face_img_demo.py):
face boxes -> 2D landmarks with a face-dataset metadata head.

Usage:
  python demo/face_img_demo.py IMG [--face-box x,y,w,h]
      [--dataset 300w] [--out-img-root vis/]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

if os.environ.get('JAX_PLATFORMS'):
    import jax
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('img')
    ap.add_argument('--face-box', default=None,
                    help='x,y,w,h (default: full image)')
    ap.add_argument('--dataset', default='300w')
    ap.add_argument('--checkpoint', default=None)
    ap.add_argument('--variant', default='s')
    ap.add_argument('--out-img-root', default='vis_results')
    ap.add_argument('--kpt-thr', type=float, default=0.3)
    args = ap.parse_args()

    import cv2
    from vitpose_tpu.api import (init_pose_model,
                                 inference_top_down_pose_model,
                                 vis_pose_result)
    from vitpose_tpu.data import DatasetInfo

    info = DatasetInfo.load(args.dataset)
    model = init_pose_model(
        dict(variant=args.variant, dataset=args.dataset,
             out_channels=info.num_joints), checkpoint=args.checkpoint)
    img = cv2.cvtColor(cv2.imread(args.img), cv2.COLOR_BGR2RGB)
    if args.face_box:
        box = [float(v) for v in args.face_box.split(',')]
    else:
        box = [0, 0, img.shape[1], img.shape[0]]
    results, _ = inference_top_down_pose_model(model, img,
                                               [{'bbox': box}])
    os.makedirs(args.out_img_root, exist_ok=True)
    out = os.path.join(args.out_img_root,
                       'vis_face_' + os.path.basename(args.img))
    vis_pose_result(model, img, results, kpt_score_thr=args.kpt_thr,
                    out_file=out)
    print(f'{len(results)} faces -> {out}')


if __name__ == '__main__':
    main()

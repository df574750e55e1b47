#!/usr/bin/env python
"""Bottom-up (associative embedding) image demo (counterpart of reference
demo/bottom_up_img_demo.py): whole-image multi-person pose without boxes.

Usage:
  python demo/bottom_up_img_demo.py IMG [--out-img-root vis/]
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
    ap.add_argument('--checkpoint', default=None,
                    help='estimator weights (.npz)')
    ap.add_argument('--base-size', type=int, default=256)
    ap.add_argument('--out-img-root', default='vis_results')
    ap.add_argument('--kpt-thr', type=float, default=0.3)
    args = ap.parse_args()

    import cv2
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bottom_up_video_demo import build_estimator
    from vitpose_tpu.api.inference import (inference_bottom_up_pose_model,
                                           vis_pose_result)
    from vitpose_tpu.data import DatasetInfo

    info = DatasetInfo.load('coco')
    s = args.base_size
    est, variables = build_estimator(s, args.checkpoint)

    img = cv2.cvtColor(cv2.imread(args.img), cv2.COLOR_BGR2RGB)
    results, scores = inference_bottom_up_pose_model(
        est, variables, img, base_size=s)
    os.makedirs(args.out_img_root, exist_ok=True)
    out = os.path.join(args.out_img_root,
                       'vis_bu_' + os.path.basename(args.img))
    vis_pose_result(None, img, results, kpt_score_thr=args.kpt_thr,
                    dataset_info=info, out_file=out)
    print(f'{len(results)} persons -> {out}')


if __name__ == '__main__':
    main()

#!/usr/bin/env python
"""Video top-down demo (counterpart of reference
demo/top_down_video_demo_full_frame_without_det.py): full-frame person box
per frame -> pose -> annotated video.

Usage:
  python demo/top_down_video_demo.py VIDEO [--checkpoint ckpt.pth]
      [--variant s] [--out-video-root vis/]
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
    ap.add_argument('video')
    ap.add_argument('--checkpoint', default=None)
    ap.add_argument('--variant', default='s')
    ap.add_argument('--out-video-root', default='vis_results')
    ap.add_argument('--kpt-thr', type=float, default=0.3)
    ap.add_argument('--max-frames', type=int, default=0)
    args = ap.parse_args()

    import cv2
    from vitpose_tpu.api import (init_pose_model,
                                 inference_top_down_pose_model,
                                 vis_pose_result)

    model = init_pose_model(args.variant, checkpoint=args.checkpoint)
    cap = cv2.VideoCapture(args.video)
    assert cap.isOpened(), args.video
    fps = cap.get(cv2.CAP_PROP_FPS) or 25
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    os.makedirs(args.out_video_root, exist_ok=True)
    out_path = os.path.join(args.out_video_root,
                            'vis_' + os.path.basename(args.video))
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*'mp4v'),
                             fps, (w, h))
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok or (args.max_frames and n >= args.max_frames):
            break
        person = [{'bbox': [0, 0, w, h]}]      # full-frame box
        pose_results, _ = inference_top_down_pose_model(
            model, frame[..., ::-1], person)
        vis = vis_pose_result(model, frame[..., ::-1], pose_results,
                              kpt_score_thr=args.kpt_thr)
        writer.write(vis)  # vis_pose_result returns BGR
        n += 1
    writer.release()
    cap.release()
    print(f'{n} frames -> {out_path}')


if __name__ == '__main__':
    main()

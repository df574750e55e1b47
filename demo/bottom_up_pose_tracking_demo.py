#!/usr/bin/env python
"""Bottom-up pose-tracking video demo (counterpart of reference
demo/bottom_up_pose_tracking_demo.py): whole-frame AE pose per frame +
IoU/OKS greedy track association across frames.

Usage:
  python demo/bottom_up_pose_tracking_demo.py VIDEO
      [--use-oks-tracking] [--out-video-root vis/]
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
    ap.add_argument('--base-size', type=int, default=256)
    ap.add_argument('--out-video-root', default='vis_results')
    ap.add_argument('--kpt-thr', type=float, default=0.3)
    ap.add_argument('--tracking-thr', type=float, default=0.3)
    ap.add_argument('--use-oks-tracking', action='store_true')
    ap.add_argument('--max-frames', type=int, default=0)
    args = ap.parse_args()

    import cv2
    from vitpose_tpu.api.inference import (inference_bottom_up_pose_model,
                                           vis_pose_result)
    from vitpose_tpu.api.tracking import get_track_id
    from bottom_up_video_demo import build_estimator

    est, variables = build_estimator(args.base_size, args.checkpoint)
    cap = cv2.VideoCapture(args.video)
    assert cap.isOpened(), args.video
    fps = cap.get(cv2.CAP_PROP_FPS) or 25
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    os.makedirs(args.out_video_root, exist_ok=True)
    out_path = os.path.join(args.out_video_root,
                            'bu_track_' + os.path.basename(args.video))
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*'mp4v'),
                             fps, (w, h))
    results_last, next_id, n = [], 0, 0
    while True:
        ok, frame = cap.read()
        if not ok or (args.max_frames and n >= args.max_frames):
            break
        results, _ = inference_bottom_up_pose_model(
            est, variables, frame[..., ::-1], base_size=args.base_size)
        results, next_id = get_track_id(
            results, results_last, next_id,
            use_oks=args.use_oks_tracking,
            tracking_thr=args.tracking_thr)
        results_last = results
        vis = vis_pose_result(None, frame[..., ::-1], results,
                              kpt_score_thr=args.kpt_thr,
                              dataset_info=est.dataset_info)
        writer.write(vis)  # vis_pose_result returns BGR
        n += 1
    writer.release()
    cap.release()
    print(f'{n} frames, {next_id} tracks -> {out_path}')


if __name__ == '__main__':
    main()

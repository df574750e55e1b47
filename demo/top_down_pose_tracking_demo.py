#!/usr/bin/env python
"""Pose-tracking demo (counterpart of reference
demo/top_down_pose_tracking_demo_with_mmdet.py, with a detection json or
full-frame boxes instead of mmdet): per-frame pose + IoU/OKS track ids.

Usage:
  python demo/top_down_pose_tracking_demo.py VIDEO [--det-json dets.json]
      [--use-oks-tracking] [--out-video-root vis/]
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
    ap.add_argument('video')
    ap.add_argument('--det-json', default=None,
                    help='json: {frame_idx: [xywh boxes]}')
    ap.add_argument('--checkpoint', default=None)
    ap.add_argument('--variant', default='s')
    ap.add_argument('--out-video-root', default='vis_results')
    ap.add_argument('--kpt-thr', type=float, default=0.3)
    ap.add_argument('--tracking-thr', type=float, default=0.3)
    ap.add_argument('--use-oks-tracking', action='store_true')
    ap.add_argument('--max-frames', type=int, default=0)
    args = ap.parse_args()

    import cv2
    from vitpose_tpu.api import (init_pose_model,
                                 inference_top_down_pose_model,
                                 vis_pose_result)
    from vitpose_tpu.api.tracking import get_track_id

    model = init_pose_model(args.variant, checkpoint=args.checkpoint)
    dets = json.load(open(args.det_json)) if args.det_json else None
    cap = cv2.VideoCapture(args.video)
    assert cap.isOpened(), args.video
    fps = cap.get(cv2.CAP_PROP_FPS) or 25
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    os.makedirs(args.out_video_root, exist_ok=True)
    out_path = os.path.join(args.out_video_root,
                            'track_' + os.path.basename(args.video))
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*'mp4v'),
                             fps, (w, h))
    results_last, next_id, n = [], 0, 0
    while True:
        ok, frame = cap.read()
        if not ok or (args.max_frames and n >= args.max_frames):
            break
        boxes = (dets.get(str(n), []) if dets else [[0, 0, w, h]])
        person = [{'bbox': b} for b in boxes]
        pose_results, _ = inference_top_down_pose_model(
            model, frame[..., ::-1], person)
        pose_results, next_id = get_track_id(
            pose_results, results_last, next_id,
            use_oks=args.use_oks_tracking, tracking_thr=args.tracking_thr,
            bbox_format='xywh')
        results_last = pose_results
        vis = vis_pose_result(model, frame[..., ::-1], pose_results,
                              kpt_score_thr=args.kpt_thr)
        writer.write(vis)  # vis_pose_result returns BGR
        n += 1
    writer.release()
    cap.release()
    print(f'{n} frames, {next_id} tracks -> {out_path}')


if __name__ == '__main__':
    main()

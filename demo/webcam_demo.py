#!/usr/bin/env python
"""Realtime pose demo over camera/video/image-dir input (counterpart of
reference demo/webcam_demo.py + tools/webcam).

Usage:
  python demo/webcam_demo.py --input /path/to/video_or_dir \
      [--variant s] [--checkpoint x.pth] [--out out.mp4] [--max-frames N] \
      [--effect sunglasses|bugeye]
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
    ap.add_argument('--input', default=0,
                    help='camera index, video file, or image directory')
    ap.add_argument('--variant', default='s')
    ap.add_argument('--checkpoint', default=None)
    ap.add_argument('--out', default=None)
    ap.add_argument('--max-frames', type=int, default=None)
    ap.add_argument('--effect', default=None,
                    choices=['sunglasses', 'bugeye'],
                    help='pose-anchored frame effect instead of the '
                         'skeleton overlay (reference tools/webcam '
                         'effect nodes)')
    mode = ap.add_mutually_exclusive_group()
    mode.add_argument('--sync', action='store_true',
                      help='run inference synchronously per frame (the '
                           'default for video/dir inputs, where every '
                           'output frame should be annotated)')
    mode.add_argument('--async', dest='async_', action='store_true',
                      help='buffered async graph: display at source rate, '
                           'inference on the latest frame only (the '
                           'default for live cameras)')
    args = ap.parse_args()

    from vitpose_tpu.api import init_pose_model
    from vitpose_tpu.api.webcam import (WebcamRunner, AsyncWebcamRunner,
                                        DetectorNode, PoseNode,
                                        VisualizerNode, VideoSink,
                                        EffectNode)

    model = init_pose_model(args.variant, checkpoint=args.checkpoint)
    # record at the source's real rate (video files report theirs; live
    # cameras often report 0 -> keep the 30fps default)
    import cv2
    is_cam = str(args.input).isdigit()
    probe = cv2.VideoCapture(int(args.input) if is_cam else args.input)
    src_fps = probe.get(cv2.CAP_PROP_FPS) or 0
    probe.release()
    sink = VideoSink(args.out, fps=src_fps if src_fps > 0 else 30)
    render = (EffectNode(model, kind=args.effect) if args.effect
              else VisualizerNode(model))
    # live cameras default to the async graph (keep the camera rate, drop
    # frames for inference); files/dirs default to per-frame sync so every
    # output frame is annotated
    is_camera = str(args.input).isdigit()
    # cv2.VideoCapture needs a device INDEX for cameras, not the string
    source = int(args.input) if is_camera else args.input
    use_async = args.async_ or (is_camera and not args.sync)
    if use_async:
        runner = AsyncWebcamRunner(
            source, [DetectorNode(), PoseNode(model)], [render, sink],
            max_frames=args.max_frames)
    else:
        runner = WebcamRunner(
            source,
            [DetectorNode(), PoseNode(model), render, sink],
            max_frames=args.max_frames)
    n = runner.run()
    print(f'processed {n} frames; ' + '; '.join(
        runner.stopwatch.report_strings()))


if __name__ == '__main__':
    main()

#!/usr/bin/env python
"""Bottom-up video demo (counterpart of reference
demo/bottom_up_video_demo.py): whole-frame multi-person AE pose per
frame, no detector -> annotated video.

Usage:
  python demo/bottom_up_video_demo.py VIDEO [--checkpoint ckpt.npz]
      [--out-video-root vis/]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

if os.environ.get('JAX_PLATFORMS'):
    import jax
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])


def build_estimator(base_size, checkpoint):
    import jax
    import jax.numpy as jnp
    from vitpose_tpu.models.bottomup import BottomUpEstimator
    from vitpose_tpu.models.vit import ViTConfig
    from vitpose_tpu.data import DatasetInfo

    info = DatasetInfo.load('coco')
    est = BottomUpEstimator(
        ViTConfig(img_size=(base_size, base_size), embed_dim=384,
                  depth=12, num_heads=12),
        num_joints=17, dataset_info=info)
    variables = est.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, base_size, base_size, 3)))
    if checkpoint:
        from vitpose_tpu.utils.checkpoint import load_params_npz
        variables = load_params_npz(checkpoint)
    return est, variables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('video')
    ap.add_argument('--checkpoint', default=None)
    ap.add_argument('--base-size', type=int, default=256)
    ap.add_argument('--out-video-root', default='vis_results')
    ap.add_argument('--kpt-thr', type=float, default=0.3)
    ap.add_argument('--max-frames', type=int, default=0)
    args = ap.parse_args()

    import cv2
    from vitpose_tpu.api.inference import (inference_bottom_up_pose_model,
                                           vis_pose_result)

    est, variables = build_estimator(args.base_size, args.checkpoint)
    cap = cv2.VideoCapture(args.video)
    assert cap.isOpened(), args.video
    fps = cap.get(cv2.CAP_PROP_FPS) or 25
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    os.makedirs(args.out_video_root, exist_ok=True)
    out_path = os.path.join(args.out_video_root,
                            'bu_' + os.path.basename(args.video))
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*'mp4v'),
                             fps, (w, h))
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok or (args.max_frames and n >= args.max_frames):
            break
        results, _ = inference_bottom_up_pose_model(
            est, variables, frame[..., ::-1], base_size=args.base_size)
        vis = vis_pose_result(None, frame[..., ::-1], results,
                              kpt_score_thr=args.kpt_thr,
                              dataset_info=est.dataset_info)
        writer.write(vis)  # vis_pose_result returns BGR
        n += 1
    writer.release()
    cap.release()
    print(f'{n} frames -> {out_path}')


if __name__ == '__main__':
    main()

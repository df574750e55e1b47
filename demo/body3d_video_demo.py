#!/usr/bin/env python
"""Two-stage 3D video demo (counterpart of reference
demo/body3d_two_stage_video_demo.py): 2D top-down poses per frame ->
temporal lifting (TCN) -> 3D skeleton renders.

Usage:
  python demo/body3d_video_demo.py VIDEO [--out-img-root vis/]
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
    ap.add_argument('--checkpoint', default=None,
                    help='2D pose model weights')
    ap.add_argument('--lifter-checkpoint', default=None,
                    help='PoseLifter weights (.npz from the lifter loop)')
    ap.add_argument('--variant', default='s')

    ap.add_argument('--out-img-root', default='vis_results')
    ap.add_argument('--max-frames', type=int, default=0)
    args = ap.parse_args()

    import cv2
    import jax
    from vitpose_tpu.api import (init_pose_model,
                                 inference_top_down_pose_model)
    from vitpose_tpu.api.inference import vis_pose_result_3d
    from vitpose_tpu.api.inference_3d import (extract_pose_sequence,
                                              inference_pose_lifter_model)
    import jax.numpy as jnp
    from vitpose_tpu.models.pose3d import PoseLifter
    from vitpose_tpu.data import DatasetInfo

    model = init_pose_model(args.variant, checkpoint=args.checkpoint)
    lifter = PoseLifter(num_joints=17)
    rf = lifter.receptive_field
    if args.lifter_checkpoint:
        from vitpose_tpu.utils.checkpoint import load_params_npz
        lift_vars = load_params_npz(args.lifter_checkpoint)
    else:
        print('WARNING: no --lifter-checkpoint given — the 3D stage runs '
              'with RANDOM weights (output is structural only)')
        lift_vars = lifter.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, rf, 17, 2)))

    cap = cv2.VideoCapture(args.video)
    assert cap.isOpened(), args.video
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    pose_2d_list = []
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok or (args.max_frames and n >= args.max_frames):
            break
        pose_results, _ = inference_top_down_pose_model(
            model, frame[..., ::-1], [{'bbox': [0, 0, w, h]}])
        pose_2d_list.append(pose_results)
        n += 1
    cap.release()

    os.makedirs(args.out_img_root, exist_ok=True)
    info = DatasetInfo.load('h36m')
    outs = 0
    for fi in range(len(pose_2d_list)):
        seq = extract_pose_sequence(pose_2d_list, fi, causal=False,
                                    seq_len=rf)
        res3d = inference_pose_lifter_model(lifter, lift_vars, seq,
                                            image_size=(w, h))
        if res3d:
            out = os.path.join(args.out_img_root, f'3d_{fi:05d}.png')
            vis_pose_result_3d(res3d, skeleton=info.skeleton_links,
                               out_file=out)
            outs += 1
    print(f'{n} frames, {outs} 3D renders -> {args.out_img_root}')


if __name__ == '__main__':
    main()

#!/usr/bin/env python
"""Two-stage 3D image demo (counterpart of reference
demo/body3d_two_stage_img_demo.py): 2D keypoints from a COCO-style json
(or estimated top-down from GT boxes) -> single-frame pose lifter ->
3D skeleton render per person.

Usage:
  python demo/body3d_two_stage_img_demo.py IMG --json-file kpts.json
      [--out-img-root vis/]
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
    ap.add_argument('--json-file', default=None,
                    help='COCO keypoints json; keypoints are used directly '
                         'as the 2D stage (reference --only-second-stage)')
    ap.add_argument('--checkpoint', default=None,
                    help='.npz lifter weights')
    ap.add_argument('--variant', default='s')
    ap.add_argument('--out-img-root', default='vis_results')
    args = ap.parse_args()

    import cv2
    import numpy as np
    import jax
    import jax.numpy as jnp
    from vitpose_tpu.api import (init_pose_model,
                                 inference_top_down_pose_model)
    from vitpose_tpu.api.inference import vis_pose_result_3d
    from vitpose_tpu.api.inference_3d import inference_pose_lifter_model
    from vitpose_tpu.models.pose3d import PoseLifter
    from vitpose_tpu.data import DatasetInfo

    img = cv2.cvtColor(cv2.imread(args.img), cv2.COLOR_BGR2RGB)
    h, w = img.shape[:2]

    if args.json_file:
        anns = json.load(open(args.json_file))
        anns = anns.get('annotations', anns)
        pose_results = []
        for a in anns:
            kp = np.asarray(a['keypoints'], np.float32).reshape(-1, 3)
            pose_results.append({'keypoints': kp,
                                 'bbox': a.get('bbox', [0, 0, w, h])})
    else:
        model = init_pose_model(args.variant, checkpoint=None)
        pose_results, _ = inference_top_down_pose_model(
            model, img, [{'bbox': [0, 0, w, h]}])

    num_joints = pose_results[0]['keypoints'].shape[0]
    lifter = PoseLifter(num_joints=num_joints)
    rf = lifter.receptive_field
    lift_vars = lifter.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, rf, num_joints, 2)))
    if args.checkpoint:
        from vitpose_tpu.utils.checkpoint import load_params_npz
        lift_vars = load_params_npz(args.checkpoint)

    # single image -> repeat the frame to fill the receptive field
    seq = [pose_results] * rf
    res3d = inference_pose_lifter_model(lifter, lift_vars, seq,
                                        image_size=(w, h))
    os.makedirs(args.out_img_root, exist_ok=True)
    info = DatasetInfo.load('h36m')
    out = os.path.join(args.out_img_root,
                       '3d_' + os.path.basename(args.img) + '.png')
    vis_pose_result_3d(res3d, skeleton=info.skeleton_links, out_file=out)
    print(f'{len(res3d)} people lifted -> {out}')


if __name__ == '__main__':
    main()

#!/usr/bin/env python
"""Interacting-hand 3D image demo (counterpart of reference
demo/interhand3d_img_demo.py): hand crop -> 2.5D heatmap volume ->
42 3D hand keypoints (+ handedness, relative root depth), optionally
back-projected to camera space when focal/princpt are given.

Usage:
  python demo/interhand3d_img_demo.py IMG [--hand-box x,y,w,h]
      [--focal fx,fy --princpt cx,cy] [--out-img-root vis/]
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
    ap.add_argument('--hand-box', default=None, help='x,y,w,h')
    ap.add_argument('--checkpoint', default=None)
    ap.add_argument('--focal', default=None, help='fx,fy (camera mm)')
    ap.add_argument('--princpt', default=None, help='cx,cy')
    ap.add_argument('--out-img-root', default='vis_results')
    args = ap.parse_args()

    import cv2
    import numpy as np
    import jax
    import jax.numpy as jnp
    from vitpose_tpu.models.interhand3d import (Interhand3DEstimator,
                                                backproject_to_camera)
    from vitpose_tpu.models.vit import ViTConfig
    from vitpose_tpu.api.inference import vis_pose_result_3d
    from vitpose_tpu.utils.checkpoint import load_params_npz
    from vitpose_tpu.data import DatasetInfo

    img = cv2.cvtColor(cv2.imread(args.img), cv2.COLOR_BGR2RGB)
    h, w = img.shape[:2]
    box = ([float(v) for v in args.hand_box.split(',')]
           if args.hand_box else [0, 0, w, h])

    est = Interhand3DEstimator(
        ViTConfig(img_size=(256, 256), embed_dim=384, depth=12,
                  num_heads=12), num_joints=42)
    sample = jnp.zeros((1, 256, 256, 3))
    variables = est.init(jax.random.PRNGKey(0), sample)
    if args.checkpoint:
        variables = load_params_npz(args.checkpoint)

    # crop with the SAME convention the training loop and decode share:
    # bbox -> padded pixel_std=200 center/scale -> affine warp -> /255
    # (the interhand family feeds plain /255 inputs; a raw resize of the
    # unpadded box would make decode un-crop 1.25x too wide)
    from vitpose_tpu.ops.geometry import bbox_xywh2cs, affine_matrix
    center, scale = bbox_xywh2cs(np.asarray(box, np.float32),
                                 aspect_ratio=1.0)
    center = np.asarray(center, np.float32)
    scale = np.asarray(scale, np.float32)
    mat = np.asarray(affine_matrix(center, scale, 0.0, (256, 256)))
    crop = cv2.warpAffine(img, mat[:2], (256, 256),
                          flags=cv2.INTER_LINEAR).astype(np.float32) / 255.0
    hm3d, root_logits, type_logits = est.infer(
        variables, jnp.asarray(crop[None]))
    res = est.decode(hm3d, root_logits, type_logits, center[None],
                     scale[None])
    kp3d = res['keypoints_3d'][0]
    print('hand type (right, left):', res['hand_type'][0])
    print('relative root depth (mm):', float(res['rel_root_depth'][0]))
    if args.focal and args.princpt:
        focal = [float(v) for v in args.focal.split(',')]
        princpt = [float(v) for v in args.princpt.split(',')]
        kp3d = backproject_to_camera(kp3d, focal, princpt,
                                     abs_depth=res['rel_root_depth'][0])
        print('camera-space keypoints computed')

    os.makedirs(args.out_img_root, exist_ok=True)
    info = DatasetInfo.load('interhand3d')
    out = os.path.join(args.out_img_root,
                       'ih3d_' + os.path.basename(args.img) + '.png')
    vis_pose_result_3d([{'keypoints_3d': kp3d}],
                       skeleton=info.skeleton_links, out_file=out)
    print(f'42 keypoints -> {out}')


if __name__ == '__main__':
    main()

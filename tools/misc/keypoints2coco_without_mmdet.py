#!/usr/bin/env python
"""Pseudo-label a COCO-style json of person boxes with predicted keypoints
(counterpart of the reference's tools/misc/keypoints2coco_without_mmdet.py):
runs the top-down model on every GT bbox and writes a new COCO json whose
annotations carry the predicted keypoints (score >= kpt-thr marked
visible=2, below-threshold joints zeroed).

Usage:
    python tools/misc/keypoints2coco_without_mmdet.py CONFIG CKPT \
        --json-file boxes.json --img-root data/imgs --out-json-file out.json
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))


def pseudo_label(model, coco, img_root, kpt_thr=0.3):
    from vitpose_tpu.api.inference import inference_top_down_pose_model
    images, annotations = [], []
    ann_id = 0
    for image_id in sorted(coco.imgs):
        image = coco.loadImgs(image_id)[0]
        path = os.path.join(img_root, image['file_name'])
        person_results = [{'bbox': coco.anns[a]['bbox']}
                          for a in coco.getAnnIds(image_id)]
        pose_results, _ = inference_top_down_pose_model(
            model, path, person_results, bbox_thr=None, format='xywh')

        for res in pose_results:
            kpts = np.asarray(res['keypoints'], np.float64).copy()
            low = kpts[:, 2] < kpt_thr
            kpts[low] = 0
            kpts[~low, 2] = 2
            # res['bbox'] is the xywh input box, returned unchanged by
            # inference_top_down_pose_model
            x, y = int(res['bbox'][0]), int(res['bbox'][1])
            w = int(res['bbox'][2])
            h = int(res['bbox'][3])
            annotations.append({
                'id': ann_id,
                'image_id': int(image_id),
                'category_id': 1,
                'iscrowd': 0,
                'keypoints': [int(v) for v in kpts.reshape(-1)],
                'num_keypoints': int((~low).sum()),
                'bbox': [x, y, w, h],
                'area': round(w * h, 0),
            })
            ann_id += 1
        images.append({
            'file_name': os.path.basename(image['file_name']),
            'height': image['height'],
            'width': image['width'],
            'id': int(image_id),
        })
    return {'images': images, 'annotations': annotations,
            'categories': [{'id': 1, 'name': 'person'}]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('pose_config')
    ap.add_argument('pose_checkpoint')
    ap.add_argument('--img-root', default='')
    ap.add_argument('--json-file', required=True)
    ap.add_argument('--out-json-file', required=True)
    ap.add_argument('--kpt-thr', type=float, default=0.3)
    args = ap.parse_args()

    from vitpose_tpu.api.inference import init_pose_model
    from vitpose_tpu.data import CocoIndex
    model = init_pose_model(args.pose_config, args.pose_checkpoint)
    coco = CocoIndex(args.json_file)
    out = pseudo_label(model, coco, args.img_root, args.kpt_thr)
    with open(args.out_json_file, 'w') as f:
        json.dump(out, f, indent=2)
    print(f'wrote {args.out_json_file}')


if __name__ == '__main__':
    main()

"""Bottom-up COCO dataset + target generation for associative embedding.

Counterpart of the reference bottom-up stack
(mmpose/datasets/datasets/bottom_up/bottom_up_coco.py,
 mmpose/datasets/pipelines/bottom_up_transform.py): image-level records with
all persons' joints, a loss mask that zeroes crowd regions and unannotated
people, and per-output-scale heatmap + AE-joint targets.

TPU-first: the record preparation (resize to a static base size, joint
scaling, mask build) happens on host; heatmap target painting reuses the
vectorized jnp generators (ops/target.py) and the AE joint index arrays are
padded to [max_people, K, 2] static shapes for the device loss
(models/losses_regression.ae_tag_loss).
"""
from __future__ import annotations

import os
from typing import List

import numpy as np

from .coco_index import CocoIndex
from .dataset_info import DatasetInfo
from .mask import segmentation_to_mask


class BottomUpCocoDataset:
    """Image-level COCO records for bottom-up training/eval."""

    def __init__(self, ann_file, img_prefix, dataset_info='coco',
                 input_size=512, output_sizes=(128,), max_people=30,
                 test_mode=False):
        self.info = (dataset_info if isinstance(dataset_info, DatasetInfo)
                     else DatasetInfo.load(dataset_info))
        self.coco = CocoIndex(ann_file)
        self.img_prefix = img_prefix
        self.input_size = input_size
        self.output_sizes = tuple(output_sizes)
        self.max_people = max_people
        self.test_mode = test_mode
        self.img_ids = [i for i in self.coco.getImgIds()
                        if test_mode or len(self.coco.getAnnIds(
                            imgIds=i, iscrowd=None)) > 0]

    def __len__(self):
        return len(self.img_ids)

    def record(self, idx):
        """-> dict(image_file, joints [M, K, 3], mask_info for loss mask)."""
        img_id = self.img_ids[idx]
        img = self.coco.imgs[img_id]
        anns = self.coco.loadAnns(self.coco.getAnnIds(imgIds=img_id))
        k = self.info.num_joints
        joints = np.zeros((self.max_people, k, 3), np.float32)
        m = 0
        mask_anns = []
        for ann in anns:
            if ann.get('iscrowd', 0) or ann.get('num_keypoints', 0) == 0:
                mask_anns.append(ann)                 # masked out of loss
                continue
            if m >= self.max_people:
                continue
            kp = np.asarray(ann['keypoints'], np.float32).reshape(k, 3)
            joints[m, :, :2] = kp[:, :2]
            joints[m, :, 2] = (kp[:, 2] > 0).astype(np.float32)
            m += 1
        return dict(
            image_file=os.path.join(self.img_prefix, img['file_name']),
            image_id=img_id, width=img['width'], height=img['height'],
            joints=joints, num_people=m, mask_anns=mask_anns)

    def build_loss_mask(self, rec):
        """[h, w] float mask: 1 everywhere except crowd/unannotated
        regions (parity: bottom_up datasets' `_get_mask`)."""
        mask = np.ones((rec['height'], rec['width']), np.float32)
        for ann in rec['mask_anns']:
            if 'segmentation' in ann and ann['segmentation']:
                m = segmentation_to_mask(ann['segmentation'],
                                         rec['height'], rec['width'])
                mask[m > 0] = 0.0
        return mask


def generate_ae_targets(joints, mask, input_size, output_size, sigma=2.0,
                        max_people=30):
    """Build one output scale's training targets.

    Args:
      joints: [M, K, 3] in input-image pixels; mask [h, w] input-res.
      input_size, output_size: ints (square, reference convention).

    Returns dict(heatmaps [K, S, S] jnp, mask [S, S], ae_joints [M, K, 2]
    int32 — flat pixel index + visibility for ae_tag_loss).
    """
    import cv2
    import jax.numpy as jnp
    from ..ops.target import generate_msra_heatmaps

    stride = input_size / output_size
    k = joints.shape[1]
    scaled = joints[:, :, :2] / stride
    vis = joints[:, :, 2]

    # heatmap: max over people of per-person gaussians
    t, _ = generate_msra_heatmaps(
        scaled.reshape(-1, k, 2)[:, :, :2].reshape(joints.shape[0], k, 2),
        vis, (output_size, output_size), (output_size, output_size),
        sigma=sigma)
    heatmaps = jnp.max(t, axis=0)

    mask_s = cv2.resize(mask, (output_size, output_size),
                        interpolation=cv2.INTER_LINEAR)
    mask_s = (mask_s > 0.5).astype(np.float32)

    xi = np.clip(np.round(scaled[..., 0]).astype(np.int64), 0,
                 output_size - 1)
    yi = np.clip(np.round(scaled[..., 1]).astype(np.int64), 0,
                 output_size - 1)
    inside = ((scaled[..., 0] >= 0) & (scaled[..., 0] < output_size)
              & (scaled[..., 1] >= 0) & (scaled[..., 1] < output_size))
    ae = np.zeros(joints.shape[:2] + (2,), np.int32)
    ae[..., 0] = yi * output_size + xi
    ae[..., 1] = ((vis > 0) & inside).astype(np.int32)
    return dict(heatmaps=heatmaps, mask=jnp.asarray(mask_s),
                ae_joints=jnp.asarray(ae))

"""Bottom-up keypoint grouping (associative embedding).

Counterpart of the reference `HeatmapParser`
(mmpose/core/post_processing/group.py:144) with a TPU-first split:

  * device (jnp): heatmap NMS (max-pool equality), per-joint top-k of
    values/locations/tags — `topk_candidates` is jit-able and runs in the
    same program as the network forward;
  * host (numpy + scipy): greedy tag matching per image
    (scipy.optimize.linear_sum_assignment replaces the munkres dependency),
    0.25-pixel adjustment, and missing-joint refinement.

COCO joint matching order and all thresholds follow the reference.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

COCO_JOINT_ORDER = [i - 1 for i in
                    [1, 2, 3, 4, 5, 6, 7, 12, 13, 8, 9, 10, 11, 14, 15, 16,
                     17]]


def heatmap_nms(heatmaps, kernel=5):
    """Keep only local maxima: x * (maxpool(x) == x). [..., H, W] jnp."""
    import jax
    import jax.numpy as jnp
    pad = (kernel - 1) // 2
    shape = heatmaps.shape
    x = heatmaps.reshape((-1,) + shape[-2:])[..., None]
    m = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, kernel, kernel, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    out = jnp.where(m == x, x, 0.0)
    return out[..., 0].reshape(shape)


def topk_candidates(heatmaps, tags, max_num_people=30, nms_kernel=5):
    """Device-side stage: NMS + per-joint top-k.

    heatmaps [N, K, H, W]; tags [N, K, H, W, L].
    Returns dict(val_k [N,K,M], loc_k [N,K,M,2] (x,y), tag_k [N,K,M,L]).
    """
    import jax
    import jax.numpy as jnp
    n, k, h, w = heatmaps.shape
    hm = heatmap_nms(heatmaps, nms_kernel).reshape(n, k, h * w)
    val_k, ind = jax.lax.top_k(hm, max_num_people)
    tags_flat = tags.reshape(n, k, h * w, -1)
    tag_k = jnp.take_along_axis(tags_flat, ind[..., None], axis=2)
    x = (ind % w).astype(jnp.float32)
    y = (ind // w).astype(jnp.float32)
    loc_k = jnp.stack([x, y], axis=-1)
    return dict(val_k=val_k, loc_k=loc_k, tag_k=tag_k)


def match_by_tag(val_k, loc_k, tag_k, joint_order=None,
                 detection_threshold=0.1, tag_threshold=1.0,
                 max_num_people=30, use_detection_val=True,
                 ignore_too_much=False):
    """Host-side grouping for ONE image (parity: group.py:28
    `_match_by_tag`). val_k [K,M], loc_k [K,M,2], tag_k [K,M,L].

    Returns [P, K, 3+L] poses (x, y, score, tag...).
    """
    from scipy.optimize import linear_sum_assignment

    k, m = val_k.shape
    tag_dim = tag_k.shape[2]
    if joint_order is None:
        joint_order = (COCO_JOINT_ORDER if k == 17 else list(range(k)))
    default = np.zeros((k, 3 + tag_dim), np.float32)

    joint_dict = {}
    tag_dict = {}
    for i in range(k):
        idx = joint_order[i]
        joints = np.concatenate(
            [loc_k[idx], val_k[idx, :, None], tag_k[idx]], axis=1)
        mask = joints[:, 2] > detection_threshold
        tags = tag_k[idx][mask]
        joints = joints[mask]
        if joints.shape[0] == 0:
            continue
        if i == 0 or len(joint_dict) == 0:
            for tag, joint in zip(tags, joints):
                key = tag[0]
                joint_dict.setdefault(key, np.copy(default))[idx] = joint
                tag_dict[key] = [tag]
            continue

        grouped_keys = list(joint_dict.keys())[:max_num_people]
        grouped_tags = [np.mean(tag_dict[g], axis=0) for g in grouped_keys]
        if ignore_too_much and len(grouped_keys) == max_num_people:
            continue

        diff = joints[:, None, 3:] - np.asarray(grouped_tags)[None]
        diff_normed = np.linalg.norm(diff, ord=2, axis=2)
        diff_saved = diff_normed.copy()
        if use_detection_val:
            diff_normed = np.round(diff_normed) * 100 - joints[:, 2:3]
        num_added, num_grouped = diff_normed.shape
        if num_added > num_grouped:
            diff_normed = np.concatenate(
                [diff_normed,
                 np.full((num_added, num_added - num_grouped), 1e10,
                         np.float32)], axis=1)
        rows, cols = linear_sum_assignment(diff_normed)
        for row, col in zip(rows, cols):
            if (row < num_added and col < num_grouped
                    and diff_saved[row, col] < tag_threshold):
                key = grouped_keys[col]
                joint_dict[key][idx] = joints[row]
                tag_dict[key].append(tags[row])
            else:
                key = tags[row][0]
                joint_dict.setdefault(key, np.copy(default))[idx] = \
                    joints[row]
                tag_dict[key] = [tags[row]]

    if not joint_dict:
        return np.zeros((0, k, 3 + tag_dim), np.float32)
    return np.stack(list(joint_dict.values())).astype(np.float32)


def adjust_poses(poses, heatmaps):
    """0.25-px shift toward the larger neighbor + 0.5 center offset
    (parity: group.py:244 `HeatmapParser.adjust`). poses [P, K, 3+],
    heatmaps [K, H, W] numpy."""
    k, h, w = heatmaps.shape
    poses = poses.copy()
    for p in poses:
        for j in range(k):
            if p[j, 2] > 0:
                x, y = p[j, :2]
                xx, yy = int(x), int(y)
                hm = heatmaps[j]
                y += 0.25 if hm[min(h - 1, yy + 1), xx] > \
                    hm[max(0, yy - 1), xx] else -0.25
                x += 0.25 if hm[yy, min(w - 1, xx + 1)] > \
                    hm[yy, max(0, xx - 1)] else -0.25
                p[j, 0] = x + 0.5
                p[j, 1] = y + 0.5
    return poses


def refine_pose(heatmaps, tags, pose, use_udp=False):
    """Fill in missed joints from the pose's mean tag
    (parity: group.py:281 `HeatmapParser.refine`). heatmaps [K, H, W],
    tags [K, H, W, L], pose [K, 3+L]."""
    k, h, w = heatmaps.shape
    if tags.ndim == 3:
        tags = tags[..., None]
    found = [tags[j, int(np.clip(pose[j, 1], 0, h - 1)),
                  int(np.clip(pose[j, 0], 0, w - 1))]
             for j in range(k) if pose[j, 2] > 0]
    if not found:
        return pose
    prev_tag = np.mean(found, axis=0)
    pose = pose.copy()
    for j in range(k):
        if pose[j, 2] > 0:
            continue
        dist = np.linalg.norm(tags[j] - prev_tag[None, None], axis=2)
        norm_hm = heatmaps[j] - np.round(dist)
        yy, xx = np.unravel_index(np.argmax(norm_hm), (h, w))
        val = heatmaps[j, yy, xx]
        if val <= 0:
            continue
        x, y = float(xx), float(yy)
        if not use_udp:
            x += 0.5
            y += 0.5
        x += 0.25 if heatmaps[j, yy, min(w - 1, xx + 1)] > \
            heatmaps[j, yy, max(0, xx - 1)] else -0.25
        y += 0.25 if heatmaps[j, min(h - 1, yy + 1), xx] > \
            heatmaps[j, max(0, yy - 1), xx] else -0.25
        pose[j, :3] = (x, y, val)
    return pose


class HeatmapParser:
    """Bottom-up parser: device top-k + host grouping (parity with the
    reference HeatmapParser.parse, group.py:360)."""

    def __init__(self, num_joints=17, max_num_people=30, nms_kernel=5,
                 detection_threshold=0.1, tag_threshold=1.0,
                 use_detection_val=True, ignore_too_much=False,
                 tag_per_joint=True, use_udp=False, score_per_joint=False):
        self.num_joints = num_joints
        self.max_num_people = max_num_people
        self.nms_kernel = nms_kernel
        self.detection_threshold = detection_threshold
        self.tag_threshold = tag_threshold
        self.use_detection_val = use_detection_val
        self.ignore_too_much = ignore_too_much
        self.tag_per_joint = tag_per_joint
        self.use_udp = use_udp
        self.score_per_joint = score_per_joint

    def parse(self, heatmaps, tags, adjust=True, refine=True):
        """heatmaps [1, K, H, W], tags [1, K, H, W, L] (jnp or numpy).
        Returns (list with one [P, K, 3+L] array, scores list)."""
        cand = topk_candidates(heatmaps, tags,
                               max_num_people=self.max_num_people,
                               nms_kernel=self.nms_kernel)
        val_k = np.asarray(cand['val_k'])[0]
        loc_k = np.asarray(cand['loc_k'])[0]
        tag_k = np.asarray(cand['tag_k'])[0]
        poses = match_by_tag(
            val_k, loc_k, tag_k,
            detection_threshold=self.detection_threshold,
            tag_threshold=self.tag_threshold,
            max_num_people=self.max_num_people,
            use_detection_val=self.use_detection_val,
            ignore_too_much=self.ignore_too_much)

        hm0 = np.asarray(heatmaps)[0]
        tg0 = np.asarray(tags)[0]
        if poses.shape[0] and adjust:
            if self.use_udp:
                from .decode import post_dark_udp
                import jax.numpy as jnp
                poses[..., :2] = np.asarray(post_dark_udp(
                    jnp.asarray(poses[..., :2]),
                    jnp.asarray(hm0)[None])).astype(np.float32)
            else:
                poses = adjust_poses(poses, hm0)

        if self.score_per_joint:
            scores = [p[:, 2] for p in poses]
        else:
            scores = [p[:, 2].mean() for p in poses]

        if refine and poses.shape[0]:
            t = tg0 if self.tag_per_joint else \
                np.tile(tg0, (self.num_joints, 1, 1, 1))
            poses = np.stack([
                refine_pose(hm0, t, p, use_udp=self.use_udp)
                for p in poses])
        return [poses], scores

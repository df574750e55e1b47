"""3D pose-lifting inference API.

Counterpart of reference mmpose/apis/inference_3d.py:212
`inference_pose_lifter_model` (+ `extract_pose_sequence`): gather a temporal
window of 2D poses per target frame, normalize to image/root-centered
coordinates, run the PoseLifter, and restore global positions.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np


def extract_pose_sequence(pose_results_list, frame_idx, causal=False,
                          seq_len=27, step=1):
    """Collect a padded window of per-frame pose results around frame_idx
    (parity: inference_3d.py `extract_pose_sequence`)."""
    if causal:
        frames_left, frames_right = seq_len - 1, 0
    else:
        frames_left = (seq_len - 1) // 2
        frames_right = seq_len - 1 - frames_left
    num_frames = len(pose_results_list)
    pad_left = max(0, frames_left - frame_idx // step)
    pad_right = max(0, frames_right - (num_frames - 1 - frame_idx) // step)
    start = frame_idx - (frames_left - pad_left) * step
    end = frame_idx + (frames_right - pad_right) * step + 1
    seq = pose_results_list[start:end:step]
    seq = [seq[0]] * pad_left + seq + [seq[-1]] * pad_right
    return seq


def _normalize_sequence(kp_seq, image_size=None):
    """[T, K, C>=2] pixel coords -> normalized coords in [-1, 1]-ish frame
    (reference norm: (x - w/2) / (w/2))."""
    kp = np.asarray(kp_seq, np.float32)[..., :2].copy()
    if image_size is not None:
        w, h = image_size
        kp[..., 0] = (kp[..., 0] - w / 2) / (w / 2)
        kp[..., 1] = (kp[..., 1] - h / 2) / (w / 2)
    return kp


def inference_pose_lifter_model(model, variables, pose_results_2d,
                                image_size=None, with_track_id=True,
                                norm_pose_2d=False, causal=False):
    """Lift a temporal sequence of 2D poses to 3D.

    Args:
      model: vitpose_tpu.models.pose3d.PoseLifter
      pose_results_2d: list over T frames of lists of person dicts with
        'keypoints' [K, 3] (+ optional 'track_id').
      image_size: (w, h) — when given, 2D coords are normalized to the
        VideoPose3D [-1, 1] frame the lifters train on (applied whenever
        provided; ``norm_pose_2d`` is the older alias for the same
        normalization and is kept for compatibility).
      causal: the window came from extract_pose_sequence(causal=True), so
        the TARGET frame is the last one, not the middle (reference
        inference_3d.py target_idx = -1 when causal).

    Returns: list of dicts with 'keypoints_3d' [K, 3] (and, for with_traj
    lifters, 'traj' [1, 3]) for each person of the target frame.
    """
    import jax.numpy as jnp

    t_len = model.receptive_field
    assert len(pose_results_2d) == t_len, \
        f'need a {t_len}-frame window, got {len(pose_results_2d)}'
    target_idx = -1 if causal else len(pose_results_2d) // 2
    center = pose_results_2d[target_idx]

    results = []
    for person in center:
        tid = person.get('track_id', None)
        seq = []
        for frame in pose_results_2d:
            match = None
            if with_track_id and tid is not None:
                for p in frame:
                    if p.get('track_id') == tid:
                        match = p
                        break
            if match is None and frame:
                match = frame[0]
            seq.append(match['keypoints'] if match is not None
                       else person['keypoints'])
        kp = _normalize_sequence(np.stack(seq), image_size)
        out = model.apply(variables, jnp.asarray(kp)[None], train=False)
        res = dict(person)
        if isinstance(out, tuple):
            # with_traj lifter: (pose, traj) — keep the global root too
            pose3d, traj = out
            res['keypoints_3d'] = np.asarray(pose3d)[0]
            res['traj'] = np.asarray(traj)[0]
        else:
            res['keypoints_3d'] = np.asarray(out)[0]
        results.append(res)
    return results

"""CMU Panoptic multiview 3D dataset (counterpart of reference
Body3DMviewDirectPanopticDataset,
mmpose/datasets/datasets/body3d/body3d_mview_direct_panoptic_dataset.py):
per-frame multi-person 3D bodies (coco19 layout, [K*4] with confidence)
plus per-camera calibration (K/R/t/distCoef). Panoptic's world is in cm
with a y-down convention; `M` converts to the x-right/y-forward/z-up mm
frame used by the voxel pipeline (same transform as the reference).

Provides the scene records + SimpleCamera objects that feed
models/voxelpose.DetectAndRegress, and MPJPE/recall evaluation over
per-person matches.
"""
from __future__ import annotations

import glob
import json
import os
import re
from collections import OrderedDict

import numpy as np

from ..ops.camera import SimpleCamera

# panoptic world (cm, y-down) -> pipeline world (mm-ish, z-up)
M_CONV = np.array([[1.0, 0.0, 0.0],
                   [0.0, 0.0, -1.0],
                   [0.0, 1.0, 0.0]])


class PanopticMviewDataset:
    def __init__(self, seq_dirs, cam_names=None, num_joints=19,
                 coord_scale=10.0):
        """seq_dirs: list of panoptic sequence dirs (each containing
        hdPose3d_stage1_coco19/ + calibration_*.json).
        cam_names: restrict to these camera names (default: all hd/vga)."""
        self.num_joints = num_joints
        self.coord_scale = coord_scale
        self.frames = []
        self.cameras = {}
        for seq in seq_dirs:
            calib_files = glob.glob(os.path.join(seq, 'calibration_*.json'))
            cams = []
            if calib_files:
                with open(calib_files[0]) as f:
                    calib = json.load(f)
                for cam in calib['cameras']:
                    if cam_names and cam['name'] not in cam_names:
                        continue
                    cams.append(self._make_camera(cam))
            self.cameras[seq] = cams
            for pose_file in sorted(glob.glob(os.path.join(
                    seq, 'hdPose3d_stage1_coco19', '*.json'))):
                self.frames.append((seq, pose_file))

    def _make_camera(self, cam):
        k_mat = np.asarray(cam['K'], np.float64)
        r = np.asarray(cam['R'], np.float64)
        t = np.asarray(cam['t'], np.float64).reshape(3)
        # panoptic extrinsics: X_cam = R @ X_world + t (world in cm, y-down)
        # convert to our convention: world' = M @ world * scale
        r_w2c = r @ M_CONV.T
        # camera position in converted world coords
        pos = -(M_CONV @ r.T @ t) * self.coord_scale
        param = dict(
            R=r_w2c.T,                         # camera-to-world rotation
            T=pos.reshape(3, 1),
            K=k_mat[:2, :3],
            k=np.asarray(cam.get('distCoef', [0] * 5))[[0, 1, 4]],
            p=np.asarray(cam.get('distCoef', [0] * 5))[[2, 3]],
        )
        return SimpleCamera(param)

    def __len__(self):
        return len(self.frames)

    def __getitem__(self, idx):
        seq, pose_file = self.frames[idx]
        with open(pose_file) as f:
            scene = json.load(f)
        people = []
        for body in scene.get('bodies', []):
            j = np.asarray(body['joints19'], np.float64).reshape(-1, 4)
            xyz = (M_CONV @ j[:, :3].T).T * self.coord_scale
            people.append(dict(id=body['id'],
                               joints_3d=xyz.astype(np.float32),
                               joints_vis=(j[:, 3] > 0.1).astype(
                                   np.float32)))
        return dict(sequence=seq, pose_file=pose_file, people=people,
                    cameras=self.cameras[seq])

    # ------------------------------------------------------------------
    def evaluate(self, results, mpjpe_threshold=500.0):
        """results: list over frames of lists of (joints_3d [K,3], score).
        Greedy-match predictions to GT people; report MPJPE over matches
        and recall@threshold (reference protocol's spirit)."""
        errs, n_gt, n_matched = [], 0, 0
        for idx, frame_preds in enumerate(results):
            gt = self[idx]['people']
            n_gt += len(gt)
            used = set()
            for pred_joints, _score in frame_preds:
                best, best_err = None, np.inf
                for gi, person in enumerate(gt):
                    if gi in used:
                        continue
                    m = person['joints_vis'] > 0
                    if not m.any():
                        continue
                    e = np.linalg.norm(
                        (np.asarray(pred_joints)[:len(m)]
                         - person['joints_3d'])[m], axis=-1).mean()
                    if e < best_err:
                        best, best_err = gi, e
                if best is not None and best_err < mpjpe_threshold:
                    used.add(best)
                    errs.append(best_err)
                    n_matched += 1
        return OrderedDict([
            ('MPJPE', float(np.mean(errs)) if errs else -1.0),
            ('Recall', n_matched / max(n_gt, 1)),
        ])

#!/usr/bin/env python
"""Preprocess the raw MPI-INF-3DHP release into the npz annotation format
(imgname/center/scale/part/S) + camera pkls consumed by
vitpose_tpu/data/body3d.py (counterpart of the reference's
tools/dataset/preprocess_mpi_inf_3dhp.py).

Train side: parses each sequence's camera.calibration (7-line blocks:
size / intrinsics K / extrinsics RT), subselects the 17-joint subset from
the 28-joint annot.mat, converts mm -> m, writes frames extracted from
video_{cam}.avi. Test side: reads annot_data.mat (HDF5), least-squares
estimates intrinsics from the 2D/3D correspondences, keeps
valid_frame == 1 rows. Pose mean/std stats (absolute + root-relative) are
pickled per the reference (:208-240).

Usage:
    python tools/dataset/preprocess_mpi_inf_3dhp.py DATA_ROOT OUT_DIR
"""
import argparse
import os
import pickle
import shutil
from os.path import join

import numpy as np

TRAIN_SUBJECTS = list(range(1, 9))
TEST_SUBJECTS = list(range(1, 7))
TRAIN_SEQS = [1, 2]
TRAIN_CAMS = [0, 1, 2, 4, 5, 6, 7, 8]
TRAIN_IMG_SIZE = (2048, 2048)
ROOT_INDEX = 14
# 28-joint training annotation -> the 17-joint H36M-style subset
JOINTS_17 = [7, 5, 14, 15, 16, 9, 10, 11, 23, 24, 25, 18, 19, 20, 4, 3, 6]


def get_pose_stats(kps):
    """mean/std over all frames, per joint ([..., K, C] -> 2x [K, C])."""
    K, C = kps.shape[-2:]
    kps = kps.reshape(-1, K, C)
    return kps.mean(axis=0), kps.std(axis=0)


def get_annotations(joints_2d, joints_3d, scale_factor=1.2,
                    img_size=TRAIN_IMG_SIZE):
    """[N,K,2]/[N,K,3] -> (centers [N,2], scales [N], 2d [N,K,3], 3d [N,K,4])
    with in-frame visibility and a scale_factor-padded tight box
    (reference preprocess_mpi_inf_3dhp.py:60-98)."""
    vis = ((joints_2d[:, :, 0] >= 0) & (joints_2d[:, :, 0] < img_size[0]) &
           (joints_2d[:, :, 1] >= 0) & (joints_2d[:, :, 1] < img_size[1]))
    vis = vis.astype(np.float32)[:, :, None]
    joints_2d = np.concatenate([joints_2d, vis], axis=-1)
    joints_3d = np.concatenate([joints_3d, vis], axis=-1)
    mn = joints_2d[:, :, :2].min(axis=1)
    mx = joints_2d[:, :, :2].max(axis=1)
    centers = (mn + mx) / 2
    scales = scale_factor * (mx - mn).max(axis=1) / 200
    return centers, scales, joints_2d, joints_3d


def parse_camera_calibration(lines, cam):
    """Pull camera index `cam` out of a camera.calibration file ->
    reference-format dict(R, T[m], f, c, w, h).

    The release groups 7 attribute lines under each `name` line (the
    reference script indexes them by fixed offset+character slicing,
    preprocess_mpi_inf_3dhp.py:135-148); parsing by leading keyword
    accepts the same files without depending on the exact column layout.
    """
    blocks, current = [], None
    for line in lines:
        tokens = line.replace('﻿', '').split()
        if not tokens:
            continue
        if tokens[0] == 'name':
            current = {}
            blocks.append(current)
        elif current is not None:
            current[tokens[0]] = tokens[1:]
    block = blocks[cam]
    K = [float(s) for s in block['intrinsic'][:12]]
    RT = np.reshape([float(s) for s in block['extrinsic'][:16]], (4, 4))
    size = block.get('resolution', block.get('size'))
    w, h = int(float(size[0])), int(float(size[1]))
    return dict(
        R=RT[:3, :3], T=RT[:3, 3:] * 0.001,
        f=np.array([[K[0]], [K[5]]]), c=np.array([[K[2]], [K[6]]]),
        w=w, h=h)


def estimate_intrinsics(annot2, annot3):
    """Least-squares pinhole intrinsics from 2D/3D correspondences
    (u*z = fx*x + cx*z), reference :280-288."""
    fx, cx = np.linalg.lstsq(
        annot3[:, :, [0, 2]].reshape(-1, 2),
        (annot2[:, :, 0] * annot3[:, :, 2]).reshape(-1, 1),
        rcond=None)[0].flatten()
    fy, cy = np.linalg.lstsq(
        annot3[:, :, [1, 2]].reshape(-1, 2),
        (annot2[:, :, 1] * annot3[:, :, 2]).reshape(-1, 1),
        rcond=None)[0].flatten()
    return dict(f=np.array([[fx], [fy]]), c=np.array([[cx], [cy]]))


def _save_npz(annot_dir, name, imgnames, centers, scales, j2d, j3d):
    out_file = join(annot_dir, name)
    np.savez(out_file, imgname=np.array(imgnames),
             center=np.concatenate(centers), scale=np.concatenate(scales),
             part=np.concatenate(j2d), S=np.concatenate(j3d))
    print(f'wrote {out_file}')
    return out_file


def _extract_video_frames(video_path, num_frames, img_dir, name_fn):
    import cv2
    names = []
    cap = cv2.VideoCapture(video_path)
    for i in range(num_frames):
        ok, img = cap.read()
        if not ok:
            break
        name = name_fn(i)
        cv2.imwrite(join(img_dir, name), img)
        names.append(name)
    cap.release()
    return names


def load_trainset(data_root, out_dir, frame_nums=None, write_images=True):
    """frame_nums overrides the per-(subject, seq) frame counts (the full
    release's counts are implied by the annot.mat lengths)."""
    from scipy.io import loadmat
    imgnames, centers, scales, j2d, j3d = [], [], [], [], []
    cameras = {}
    img_dir, annot_dir = join(out_dir, 'images'), join(out_dir, 'annotations')
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(annot_dir, exist_ok=True)

    for subj in TRAIN_SUBJECTS:
        for seq in TRAIN_SEQS:
            seq_path = join(data_root, 'train', f'S{subj}', f'Seq{seq}')
            if not os.path.isdir(seq_path):
                continue
            with open(join(seq_path, 'camera.calibration')) as f:
                lines = f.readlines()
            annot = loadmat(join(seq_path, 'annot.mat'))
            for cam in TRAIN_CAMS:
                cam_param = parse_camera_calibration(lines, cam)
                cam_param['name'] = f'train_cam_{cam}'
                cameras[f'S{subj}_Seq{seq}_Cam{cam}'] = cam_param

                a2 = np.reshape(annot['annot2'][cam][0], (-1, 28, 2))
                a3 = np.reshape(annot['annot3'][cam][0], (-1, 28, 3))
                n = frame_nums.get((subj, seq), len(a2)) if frame_nums \
                    else len(a2)
                c, s, k2, k3 = get_annotations(
                    a2[:n, JOINTS_17], a3[:n, JOINTS_17] * 0.001)
                centers.append(c)
                scales.append(s)
                j2d.append(k2)
                j3d.append(k3)
                if write_images:
                    names = _extract_video_frames(
                        join(seq_path, 'imageSequence', f'video_{cam}.avi'),
                        n, img_dir,
                        lambda i: f'S{subj}_Seq{seq}_Cam{cam}_{i+1:06d}.jpg')
                    if len(names) < n:
                        # truncated/short video: keep annotations aligned
                        # to the frames actually extracted, or every
                        # later sequence would pair images with the
                        # wrong pose rows
                        m = len(names)
                        centers[-1] = centers[-1][:m]
                        scales[-1] = scales[-1][:m]
                        j2d[-1] = j2d[-1][:m]
                        j3d[-1] = j3d[-1][:m]
                    imgnames.extend(names)
                else:
                    imgnames.extend(
                        f'S{subj}_Seq{seq}_Cam{cam}_{i+1:06d}.jpg'
                        for i in range(n))

    _save_npz(annot_dir, 'mpi_inf_3dhp_train.npz',
              imgnames, centers, scales, j2d, j3d)
    with open(join(annot_dir, 'cameras_train.pkl'), 'wb') as f:
        pickle.dump(cameras, f)
    save_pose_stats(np.concatenate(j3d), np.concatenate(j2d), annot_dir)


def save_pose_stats(joints_3d, joints_2d, annot_dir, root_index=ROOT_INDEX):
    """Absolute + root-relative mean/std pkls (reference :208-240)."""
    joints_3d = joints_3d[..., :3]
    joints_2d = joints_2d[..., :2]
    stats = {}
    for name, kps in [('joint3d_stats', joints_3d),
                      ('joint2d_stats', joints_2d)]:
        mean, std = get_pose_stats(kps)
        stats[name] = {'mean': mean, 'std': std}
    for name, kps, absname in [
            ('joint3d_rel_stats', joints_3d, 'joint3d_stats'),
            ('joint2d_rel_stats', joints_2d, 'joint2d_stats')]:
        rel = kps - kps[..., root_index:root_index + 1, :]
        mean, std = get_pose_stats(rel)
        mean[root_index] = stats[absname]['mean'][root_index]
        std[root_index] = stats[absname]['std'][root_index]
        stats[name] = {'mean': mean, 'std': std}
    for name, stat in stats.items():
        with open(join(annot_dir, f'{name}.pkl'), 'wb') as f:
            pickle.dump(stat, f)
    return stats


def load_testset(data_root, out_dir, valid_only=True, copy_images=True):
    import h5py
    imgnames, centers, scales, j2d, j3d = [], [], [], [], []
    cameras = {}
    img_dir, annot_dir = join(out_dir, 'images'), join(out_dir, 'annotations')
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(annot_dir, exist_ok=True)

    for subj in TEST_SUBJECTS:
        subj_path = join(data_root, 'test', f'TS{subj}')
        if not os.path.isdir(subj_path):
            continue
        with h5py.File(join(subj_path, 'annot_data.mat'), 'r') as f:
            annot2 = np.array(f['annot2']).reshape(-1, 17, 2)
            annot3 = np.array(f['annot3']).reshape(-1, 17, 3)
            valid = np.array(f['valid_frame']).reshape(-1)

        w, h = (2048, 2048) if subj <= 4 else (1920, 1080)
        cam = estimate_intrinsics(annot2, annot3)
        cam.update(w=w, h=h, name=f'test_cam_{subj}')
        cameras[f'TS{subj}'] = cam

        frames = np.nonzero(valid)[0] if valid_only else np.arange(len(annot2))
        c, s, k2, k3 = get_annotations(
            annot2[frames], annot3[frames] * 0.001, img_size=(w, h))
        centers.append(c)
        scales.append(s)
        j2d.append(k2)
        j3d.append(k3)
        for i in frames:
            name = f'TS{subj}_{i+1:06d}.jpg'
            src = join(subj_path, 'imageSequence', f'img_{i+1:06d}.jpg')
            if copy_images and os.path.exists(src):
                shutil.copyfile(src, join(img_dir, name))
            imgnames.append(name)

    suffix = 'valid' if valid_only else 'all'
    _save_npz(annot_dir, f'mpi_inf_3dhp_test_{suffix}.npz',
              imgnames, centers, scales, j2d, j3d)
    with open(join(annot_dir, 'cameras_test.pkl'), 'wb') as f:
        pickle.dump(cameras, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('data_root')
    ap.add_argument('out_dir')
    ap.add_argument('--no-images', action='store_true',
                    help='skip frame extraction/copying (annotations only)')
    args = ap.parse_args()
    load_trainset(args.data_root, args.out_dir,
                  write_images=not args.no_images)
    load_testset(args.data_root, args.out_dir, valid_only=True,
                 copy_images=not args.no_images)


if __name__ == '__main__':
    main()

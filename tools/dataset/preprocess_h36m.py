#!/usr/bin/env python
"""Preprocess the raw Human3.6M release into sampled frames + the npz
annotation format (imgname/center/scale/part/S) + cameras.pkl
(counterpart of the reference's tools/dataset/preprocess_h36m.py).

Stages: extract the per-subject tgz archives; parse metadata.xml for the
sequence mappings, camera ids and the packed `w0` camera-parameter vector;
emit cameras.pkl (R/T/f/c/k/p per (subject, camera)); subsample the
32-joint MyPoseFeatures D2/D3 pose tracks to the 17 movable joints at
fps50/sample_rate; extract the matching video frames; write
h36m_{train,test}.npz and train pose statistics.

Pose tracks in the release are Matlab CDF files. Reading them requires
`spacepy.pycdf` (not bundled here); pre-converted `.npy` files with the
same basename are used when present, so the conversion can also run on
poses exported once elsewhere via `python -c "... np.save(...)"`.

Usage:
    python tools/dataset/preprocess_h36m.py --metadata metadata.xml \
        --original data/h36m_raw [--extracted DIR] [--processed DIR] \
        [--sample-rate 5]
"""
import argparse
import os
import pickle
import tarfile
import xml.etree.ElementTree as ET
from os.path import join

import numpy as np

SUBJECTS_ANNOT = ['S1', 'S5', 'S6', 'S7', 'S8', 'S9', 'S11']
SUBJECT_SPLITS = {'train': ['S1', 'S5', 'S6', 'S7', 'S8'],
                  'test': ['S9', 'S11']}
EXTRACT_FILES = ['Videos', 'D2_Positions', 'D3_Positions_mono']
# the 17 movable joints of the 32-joint H36M skeleton
MOVABLE_JOINTS = [0, 1, 2, 3, 6, 7, 8, 12, 13, 14, 15, 17, 18, 19, 25, 26, 27]
SCALE_FACTOR = 1.2
IMAGE_SIZES = {'54138969': (1000, 1002), '55011271': (1000, 1000),
               '58860488': (1000, 1000), '60457274': (1000, 1002)}


def read_pose_track(path_base):
    """Read a [1, N, D*32] pose track from `path_base`.cdf (spacepy) or a
    pre-converted .npy next to it."""
    npy = path_base + '.npy'
    if os.path.exists(npy):
        return np.load(npy)
    try:
        from spacepy import pycdf
    except ImportError as e:
        raise ImportError(
            f'{path_base}.cdf needs spacepy to read; pre-convert it to '
            f'{npy} (np.save of the CDF "Pose" variable) instead') from e
    with pycdf.CDF(path_base + '.cdf') as cdf:
        return np.array(cdf['Pose'])


class PreprocessH36m:
    def __init__(self, metadata, original_dir, extracted_dir=None,
                 processed_dir=None, sample_rate=5):
        self.metadata = metadata
        self.original_dir = original_dir
        parent = os.path.dirname(os.path.abspath(original_dir))
        self.extracted_dir = extracted_dir or join(parent, 'extracted')
        self.processed_dir = processed_dir or join(parent, 'processed')
        self.sample_rate = sample_rate
        self._load_metadata()

    # -- metadata -----------------------------------------------------

    def _load_metadata(self):
        """Parse metadata.xml: mapping table rows 2-32 give per-subject
        sequence file prefixes; dbcameras/index2id the camera ids; w0 the
        packed camera parameters (reference preprocess_h36m.py:222-248)."""
        root = ET.parse(self.metadata).getroot()
        self.sequence_mappings = {}
        self.subjects = []
        for i, tr in enumerate(root.find('mapping')):
            cells = [td.text for td in tr]
            if i == 0:
                self.subjects = cells[2:]
                self.sequence_mappings = {s: {} for s in self.subjects}
            elif i < 33:
                action_id, subaction_id = cells[0], cells[1]
                for subject, prefix in zip(self.subjects, cells[2:]):
                    self.sequence_mappings[subject][
                        (action_id, subaction_id)] = prefix
        self.action_names = {
            str(i + 1): el.text
            for i, el in enumerate(root.find('actionnames'))}
        self.camera_ids = [el.text
                           for el in root.find('dbcameras/index2id')]
        self.cameras_raw = [float(v)
                            for v in root.find('w0').text[1:-1].split()]

    def _get_camera_params(self, camera, subject):
        """Unpack one camera from the w0 vector: 6 extrinsic values per
        (camera, subject) then 9 shared intrinsic/distortion values per
        camera (reference :255-298)."""
        m = np.zeros(15)
        start = 6 * (camera * 11 + (subject - 1))
        m[:6] = self.cameras_raw[start:start + 6]
        m[6:] = self.cameras_raw[265 + camera * 9 - 1:
                                 265 + (camera + 1) * 9 - 1]

        x, y, z = -m[0], m[1], -m[2]
        R_x = np.array([[1, 0, 0],
                        [0, np.cos(x), np.sin(x)],
                        [0, -np.sin(x), np.cos(x)]])
        R_y = np.array([[np.cos(y), 0, np.sin(y)],
                        [0, 1, 0],
                        [-np.sin(y), 0, np.cos(y)]])
        R_z = np.array([[np.cos(z), np.sin(z), 0],
                        [-np.sin(z), np.cos(z), 0],
                        [0, 0, 1]])
        w, h = IMAGE_SIZES[self.camera_ids[camera]]
        return {
            'R': (R_x @ R_y @ R_z).T,
            'T': m[3:6].reshape(-1, 1) * 0.001,
            'f': m[6:8, None], 'c': m[8:10, None],
            'k': m[10:13, None], 'p': m[13:15, None],
            'w': w, 'h': h,
            'name': f'camera{camera + 1}',
            'id': self.camera_ids[camera],
        }

    # -- stages -------------------------------------------------------

    def extract_tgz(self):
        os.makedirs(self.extracted_dir, exist_ok=True)
        for subject in SUBJECTS_ANNOT:
            cur_dir = join(self.original_dir, subject.lower())
            for file in EXTRACT_FILES:
                filename = join(cur_dir, file + '.tgz')
                if not os.path.exists(filename):
                    print(f'skip missing {filename}')
                    continue
                print(f'extracting {filename}')
                with tarfile.open(filename) as tar:
                    tar.extractall(self.extracted_dir)

    def generate_cameras_file(self):
        cameras = {}
        for subject in range(1, 12):
            for camera in range(4):
                cameras[(f'S{subject}', self.camera_ids[camera])] = \
                    self._get_camera_params(camera, subject)
        out_dir = join(self.processed_dir, 'annotation_body3d')
        os.makedirs(out_dir, exist_ok=True)
        out_file = join(out_dir, 'cameras.pkl')
        with open(out_file, 'wb') as f:
            pickle.dump(cameras, f)
        print(f'wrote {out_file}')
        return cameras

    def _load_annotations(self, subject, action, subaction, camera,
                          write_images=True):
        subj_dir = join(self.extracted_dir, subject)
        basename = (f'{self.sequence_mappings[subject][(action, subaction)]}'
                    f'.{camera}')

        kps_2d = read_pose_track(
            join(subj_dir, 'MyPoseFeatures', 'D2_Positions', basename))
        num_frames = kps_2d.shape[1]
        kps_2d = kps_2d.reshape(num_frames, 32, 2)[::self.sample_rate,
                                                   MOVABLE_JOINTS]
        kps_2d = np.concatenate(
            [kps_2d, np.ones((len(kps_2d), 17, 1))], axis=2)

        kps_3d = read_pose_track(
            join(subj_dir, 'MyPoseFeatures', 'D3_Positions_mono', basename))
        kps_3d = kps_3d.reshape(num_frames, 32, 3)[::self.sample_rate,
                                                   MOVABLE_JOINTS] / 1000.
        kps_3d = np.concatenate(
            [kps_3d, np.ones((len(kps_3d), 17, 1))], axis=2)

        mn = kps_2d[:, :, :2].min(axis=1)
        mx = kps_2d[:, :, :2].max(axis=1)
        centers = (mn + mx) / 2
        scales = SCALE_FACTOR * (mx - mn).max(axis=1) / 200

        sub_base = subject + '_' + basename.replace(' ', '_')
        prefix = join(subject, sub_base, sub_base)
        imgnames = np.array([
            f'{prefix}_{i * self.sample_rate + 1:06d}.jpg'
            for i in range(len(centers))])

        if write_images:
            import cv2
            os.makedirs(join(self.processed_dir, 'images', subject,
                             sub_base), exist_ok=True)
            cap = cv2.VideoCapture(
                join(subj_dir, 'Videos', basename + '.mp4'))
            i = written = 0
            while written < len(imgnames):
                ok, img = cap.read()
                if not ok:
                    break
                if i % self.sample_rate == 0:
                    dest = join(self.processed_dir, 'images',
                                imgnames[written])
                    if not os.path.exists(dest):
                        cv2.imwrite(dest, img)
                    written += 1
                i += 1
            cap.release()

        return imgnames, centers, scales, kps_2d, kps_3d

    def generate_annotations(self, write_images=True):
        output_dir = join(self.processed_dir, 'annotation_body3d',
                          f'fps{50 // self.sample_rate}')
        os.makedirs(output_dir, exist_ok=True)
        for data_split in ('train', 'test'):
            rows = [[], [], [], [], []]
            for subject in SUBJECT_SPLITS[data_split]:
                for action, subaction in self.sequence_mappings[subject]:
                    if action == '1':   # '_ALL'
                        continue
                    for camera in self.camera_ids:
                        for acc, v in zip(rows, self._load_annotations(
                                subject, action, subaction, camera,
                                write_images)):
                            acc.append(v)
            imgnames, centers, scales, kps2d, kps3d = (
                np.concatenate(r) for r in rows)
            out_file = join(output_dir, f'h36m_{data_split}.npz')
            np.savez(out_file, imgname=imgnames, center=centers,
                     scale=scales, part=kps2d, S=kps3d)
            print(f'wrote {out_file} ({len(imgnames)} samples)')
            if data_split == 'train':
                self._save_stats(kps3d, kps2d, output_dir)

    @staticmethod
    def _save_stats(kps3d, kps2d, output_dir):
        """Train-pose mean/std pkls; root (joint 0)-relative stats drop
        the root row (reference :168-200)."""
        def stat(kps):
            K, C = kps.shape[-2:]
            kps = kps.reshape(-1, K, C)
            return {'mean': kps.mean(axis=0), 'std': kps.std(axis=0)}
        kps3d, kps2d = kps3d[..., :3], kps2d[..., :2]
        stats = {
            'joint3d_stats': stat(kps3d),
            'joint2d_stats': stat(kps2d),
            'joint3d_rel_stats': stat(kps3d[..., 1:, :] - kps3d[..., :1, :]),
            'joint2d_rel_stats': stat(kps2d[..., 1:, :] - kps2d[..., :1, :]),
        }
        for name, s in stats.items():
            with open(join(output_dir, f'{name}.pkl'), 'wb') as f:
                pickle.dump(s, f)
        return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--metadata', required=True)
    ap.add_argument('--original', required=True)
    ap.add_argument('--extracted', default=None)
    ap.add_argument('--processed', default=None)
    ap.add_argument('--sample-rate', type=int, default=5)
    ap.add_argument('--no-images', action='store_true')
    args = ap.parse_args()
    h36m = PreprocessH36m(args.metadata, args.original, args.extracted,
                          args.processed, args.sample_rate)
    h36m.extract_tgz()
    h36m.generate_cameras_file()
    h36m.generate_annotations(write_images=not args.no_images)


if __name__ == '__main__':
    main()

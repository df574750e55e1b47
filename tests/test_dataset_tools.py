"""Tests for the tools/dataset/ + tools/misc/ conversion CLIs on synthetic
fixtures (raw-release formats fabricated in-memory: COFW HDF5 mats,
MacaquePose csv, DeepPoseKit h5, Animal-Pose VOC xml, MPI-INF-3DHP
annot.mat + camera.calibration, H36M metadata.xml + npy pose tracks)."""
import json
import os
import pickle
import sys
import xml.etree.ElementTree as ET

import numpy as np
import pytest

TOOLS_DIR = os.path.join(os.path.dirname(__file__), '..', 'tools', 'dataset')
MISC_DIR = os.path.join(os.path.dirname(__file__), '..', 'tools', 'misc')
for d in (TOOLS_DIR, MISC_DIR):
    if d not in sys.path:
        sys.path.insert(0, d)


def _write_img(path, h=32, w=48):
    import cv2
    os.makedirs(os.path.dirname(path), exist_ok=True)
    img = (np.random.RandomState(0).rand(h, w, 3) * 255).astype(np.uint8)
    cv2.imwrite(path, img)
    return img


def test_mat2json(tmp_path):
    from scipy.io import savemat
    import mat2json
    preds = np.arange(2 * 16 * 2, dtype=np.float64).reshape(2, 16, 2)
    savemat(tmp_path / 'pred.mat', {'preds': preds})
    gt = [{'joints': [[0, 0]] * 16, 'joints_vis': [1] * 16, 'image': 'a.jpg'},
          {'joints': [[1, 1]] * 16, 'joints_vis': [0] * 16, 'image': 'b.jpg'}]
    (tmp_path / 'gt.json').write_text(json.dumps(gt))
    out = mat2json.convert_mat(str(tmp_path / 'pred.mat'),
                               str(tmp_path / 'gt.json'),
                               str(tmp_path / 'out.json'))
    saved = json.loads((tmp_path / 'out.json').read_text())
    assert saved['annotations'][0]['joints'] == preds[0].tolist()
    assert 'joints_vis' not in saved['annotations'][0]
    assert out['info']['description'] == 'Converted MPII prediction.'


def test_cofw_parser(tmp_path):
    import h5py
    import parse_cofw_dataset as cofw
    # phis layout: [x*29, y*29, occ*29] transposed to [3K, N]
    K, N = 29, 2
    xs = np.linspace(5, 20, K)
    phis = np.concatenate([xs, xs + 1, np.zeros(K)])  # occ=0 -> vis 2
    with h5py.File(tmp_path / 'COFW_train_color.mat', 'w') as f:
        img = (np.random.rand(3, 40, 30) * 255).astype(np.uint8)  # CHW-ish
        refs = []
        for i in range(N):
            d = f.create_dataset(f'img{i}', data=img)
            refs.append(d.ref)
        f['IsTr'] = np.array([refs], dtype=h5py.ref_dtype)
        f['phisTr'] = np.stack([phis] * N, axis=1)
        f['bboxesTr'] = np.stack([[2, 3, 25, 25]] * N, axis=1)
    cofw.convert(str(tmp_path))
    data = json.loads(
        (tmp_path / 'annotations' / 'cofw_train.json').read_text())
    assert len(data['images']) == N and len(data['annotations']) == N
    kpts = np.array(data['annotations'][0]['keypoints']).reshape(-1, 3)
    # matlab 1-index shifted to 0-index, occlusion 0 -> visible 2
    assert kpts[0, 0] == pytest.approx(xs[0] - 1)
    assert (kpts[:, 2] == 2).all()
    assert len(data['categories'][0]['keypoints']) == K
    assert os.path.exists(tmp_path / 'images' / '000001.jpg')


def test_macaque_parser(tmp_path):
    import parse_macaquepose_dataset as mp
    _write_img(str(tmp_path / 'images' / 'm1.jpg'))
    kps = [[{'position': [3.0, 4.0]}] + [{'position': None}] * 16]
    segs = [[{'segment': [[0, 0], [10, 0], [10, 8], [0, 8]]}]]
    import csv
    with open(tmp_path / 'annotations.csv', 'w', newline='') as f:
        writer = csv.writer(f)
        writer.writerow(['image', 'keypoints', 'segmentation'])
        writer.writerow(['m1.jpg', json.dumps(kps), json.dumps(segs)])
    mp.convert(str(tmp_path), train_num=1)
    data = json.loads(
        (tmp_path / 'annotations' / 'macaque_train.json').read_text())
    ann = data['annotations'][0]
    assert ann['num_keypoints'] == 1
    assert ann['area'] == pytest.approx(80.0)        # 10x8 shoelace
    assert ann['bbox'] == [0.0, 0.0, 11.0, 9.0]      # +1 convention
    assert data['categories'][0]['name'] == 'macaque'
    # empty test split still writes a valid json
    test = json.loads(
        (tmp_path / 'annotations' / 'macaque_test.json').read_text())
    assert test['annotations'] == []


def test_deepposekit_parser(tmp_path):
    import h5py
    import parse_deepposekit_dataset as dpk
    ddir = tmp_path / 'datasets' / 'zebra'
    os.makedirs(ddir)
    N, K = 10, 9
    rng = np.random.RandomState(0)
    with h5py.File(ddir / 'annotation_data_release.h5', 'w') as f:
        f['annotations'] = rng.rand(N, K, 2) * 20 + 1
        f['annotated'] = np.ones((N, K), bool)
        f['images'] = (rng.rand(N, 24, 24, 1) * 255).astype(np.uint8)
        parents = np.array([-1, 0, 1, 2, 2, 2, 2, 2, 7])
        f['skeleton'] = np.stack([parents, np.arange(K)], axis=1)
    dpk.convert(str(tmp_path), 'zebra')
    train = json.loads(
        (ddir / 'annotations' / 'zebra_train.json').read_text())
    test = json.loads((ddir / 'annotations' / 'zebra_test.json').read_text())
    assert len(train['annotations']) == 9 and len(test['annotations']) == 1
    assert len(train['categories'][0]['keypoints']) == K
    # root (-1 parent) excluded from skeleton edges
    assert [1, 0] not in train['categories'][0]['skeleton']
    assert all(min(e) >= 1 for e in train['categories'][0]['skeleton'])
    ann = train['annotations'][0]
    assert ann['num_keypoints'] == K and ann['bbox'][2] > 0


def _animalpose_xml(tmp_path, stem='2008_000123'):
    root = ET.Element('annotation')
    ET.SubElement(root, 'image').text = stem
    ET.SubElement(root, 'category').text = 'dog'
    vb = ET.SubElement(root, 'visible_bounds')
    vb.set('xmin', '10.0')
    vb.set('ymin', '5.0')
    vb.set('width', '50.0')
    vb.set('height', '40.0')
    kpts = ET.SubElement(root, 'keypoints')
    names = list(__import__('parse_animalpose_dataset').NAME2ID)
    for i, name in enumerate(names):
        kp = ET.SubElement(kpts, 'keypoint')
        kp.set('name', name)
        kp.set('visible', '1' if i < 10 else '0')
        kp.set('x', str(10.0 + i))
        kp.set('y', str(20.0 + i))
    xml_dir = tmp_path / 'xmls' / 'dog'
    os.makedirs(xml_dir, exist_ok=True)
    ET.ElementTree(root).write(xml_dir / f'{stem}_1.xml')


def test_animalpose_parser(tmp_path):
    import parse_animalpose_dataset as ap
    _animalpose_xml(tmp_path)
    out = ap.convert(str(tmp_path / 'xmls'), str(tmp_path),
                     image_size=(375, 500))
    assert len(out['images']) == 1 and len(out['annotations']) == 1
    assert out['images'][0]['id'] == 2008000123
    ann = out['annotations'][0]
    assert ann['num_keypoints'] == 10
    assert ann['bbox'] == [10.0, 5.0, 50.0, 40.0]
    kpts = np.array(ann['keypoints']).reshape(-1, 3)
    assert kpts[0].tolist() == [10.0, 20.0, 2.0]
    assert kpts[-1].tolist() == [0.0, 0.0, 0.0]
    assert len(out['categories'][0]['keypoints']) == 20


def test_h36m_to_coco(tmp_path):
    import h36m_to_coco as h2c
    N, K = 2, 17
    rng = np.random.RandomState(0)
    names = [f'S1_Directions_1.54138969_{i:06d}.jpg' for i in range(N)]
    for n in names:
        _write_img(str(tmp_path / 'imgs' / n), 64, 64)
    np.savez(tmp_path / 'ann.npz',
             imgname=np.array(names),
             center=np.array([[50.0, 50.0]] * N),
             scale=np.array([1.5] * N),
             part=rng.rand(N, K, 3),
             S=np.concatenate([rng.rand(N, K, 3), np.ones((N, K, 1))], -1))
    R = np.eye(3)
    cams = {('S1', '54138969'): {'R': R, 'T': np.array([[1.], [2.], [3.]]),
                                 'f': [1000., 1000.], 'c': [500., 500.]}}
    with open(tmp_path / 'cams.pkl', 'wb') as f:
        pickle.dump(cams, f)
    out = h2c.convert(str(tmp_path / 'ann.npz'), str(tmp_path / 'cams.pkl'),
                      str(tmp_path / 'imgs'))
    assert len(out['images']) == N and len(out['annotations']) == N
    ann = out['annotations'][0]
    # bbox from center/scale with pixel_std 200
    assert ann['bbox'] == [-100.0, -100.0, 300.0, 300.0]
    # identity R -> world = camera + T
    k3d = np.array(ann['keypoints_3d']).reshape(K, 4)
    data = np.load(tmp_path / 'ann.npz')
    np.testing.assert_allclose(
        k3d[:, :3], data['S'][0, :, :3] + np.array([1, 2, 3]), atol=1e-5)
    assert len(out['categories'][0]['keypoints']) == 17


def _write_3dhp_train_fixture(root, n_frames=6):
    from scipy.io import savemat
    seq = root / 'train' / 'S1' / 'Seq1'
    os.makedirs(seq, exist_ok=True)
    # camera.calibration in the release layout: a file header line, then
    # per-camera attribute blocks under each `name` line
    lines = ['Skeletool Camera Calibration File V1.0\n']
    for cam in range(9):
        intr = [1500.0, 0, 1024.0, 0, 0, 1500.0, 1024.0, 0, 0, 0, 1, 0]
        rt = np.eye(4)
        rt[:3, 3] = [100.0 * cam, 0.0, 3000.0]
        lines += [
            f'name          {cam}\n',
            '  sensor      10 10\n',
            '  size        2048 2048\n',
            '  animated    0\n',
            '  intrinsic   ' + ' '.join(f'{v}' for v in intr) + ' \n',
            '  extrinsic   ' + ' '.join(f'{v}'
                                        for v in rt.reshape(-1)) + ' \n',
            '  radial      0\n',
        ]
    with open(seq / 'camera.calibration', 'w') as f:
        f.writelines(lines)
    rng = np.random.RandomState(0)
    a2 = np.empty((14, 1), object)
    a3 = np.empty((14, 1), object)
    for cam in range(14):
        a2[cam, 0] = rng.rand(n_frames, 28 * 2) * 500 + 100
        a3[cam, 0] = rng.rand(n_frames, 28 * 3) * 800
    savemat(seq / 'annot.mat', {'annot2': a2, 'annot3': a3})
    return n_frames


def test_preprocess_3dhp_train(tmp_path):
    import preprocess_mpi_inf_3dhp as pp
    n = _write_3dhp_train_fixture(tmp_path)
    pp.load_trainset(str(tmp_path), str(tmp_path / 'out'),
                     write_images=False)
    data = np.load(tmp_path / 'out' / 'annotations' /
                   'mpi_inf_3dhp_train.npz')
    assert len(data['imgname']) == n * len(pp.TRAIN_CAMS)
    assert data['part'].shape[1:] == (17, 3)
    assert data['S'].shape[1:] == (17, 4)
    with open(tmp_path / 'out' / 'annotations' / 'cameras_train.pkl',
              'rb') as f:
        cams = pickle.load(f)
    cam0 = cams['S1_Seq1_Cam0']
    assert cam0['f'][0][0] == pytest.approx(1500.0)
    assert cam0['c'][0][0] == pytest.approx(1024.0)
    assert cam0['w'] == 2048
    np.testing.assert_allclose(cam0['R'], np.eye(3))
    # mm -> m on T
    assert cam0['T'][2][0] == pytest.approx(3.0)
    # stats pkls written
    with open(tmp_path / 'out' / 'annotations' / 'joint3d_rel_stats.pkl',
              'rb') as f:
        st = pickle.load(f)
    assert st['mean'].shape == (17, 3)


def test_preprocess_3dhp_test(tmp_path):
    import h5py
    import preprocess_mpi_inf_3dhp as pp
    ts = tmp_path / 'test' / 'TS1'
    os.makedirs(ts, exist_ok=True)
    n = 8
    rng = np.random.RandomState(1)
    # build exact-pinhole correspondences so lstsq recovers intrinsics
    f_gt, c_gt = 1400.0, 1000.0
    a3 = rng.rand(n, 17, 3) * 2 + np.array([0, 0, 3.0])
    a2 = np.stack([f_gt * a3[..., 0] / a3[..., 2] + c_gt,
                   f_gt * a3[..., 1] / a3[..., 2] + c_gt], axis=-1)
    valid = np.array([1, 1, 0, 1, 1, 1, 0, 1])
    with h5py.File(ts / 'annot_data.mat', 'w') as f:
        f['annot2'] = a2.reshape(-1, 17, 2)
        f['annot3'] = a3.reshape(-1, 17, 3) * 1000  # release is mm
        f['valid_frame'] = valid.astype(np.float64)
    pp.load_testset(str(tmp_path), str(tmp_path / 'out'), valid_only=True,
                    copy_images=False)
    data = np.load(tmp_path / 'out' / 'annotations' /
                   'mpi_inf_3dhp_test_valid.npz')
    assert len(data['imgname']) == int(valid.sum())
    with open(tmp_path / 'out' / 'annotations' / 'cameras_test.pkl',
              'rb') as f:
        cams = pickle.load(f)
    assert cams['TS1']['f'][0][0] == pytest.approx(f_gt, rel=1e-3)
    assert cams['TS1']['c'][1][0] == pytest.approx(c_gt, rel=1e-3)


def _h36m_metadata_xml(path):
    """Minimal metadata.xml with 1 action x 2 subactions, 11 subjects,
    4 cameras and a w0 long enough for the parameter slicing."""
    subjects = ['S1', 'S5', 'S6', 'S7', 'S8', 'S9', 'S11',
                'S2', 'S3', 'S4', 'S10']
    root = ET.Element('metadata')
    mapping = ET.SubElement(root, 'mapping')
    hdr = ET.SubElement(mapping, 'tr')
    for txt in ['', ''] + subjects:
        ET.SubElement(hdr, 'td').text = txt
    for a, sa, nm in [('1', '1', '_ALL'), ('2', '1', 'Directions 1'),
                      ('2', '2', 'Directions')]:
        tr = ET.SubElement(mapping, 'tr')
        ET.SubElement(tr, 'td').text = a
        ET.SubElement(tr, 'td').text = sa
        for _ in subjects:
            ET.SubElement(tr, 'td').text = nm
    actions = ET.SubElement(root, 'actionnames')
    ET.SubElement(actions, 'elem').text = '_ALL'
    ET.SubElement(actions, 'elem').text = 'Directions'
    db = ET.SubElement(root, 'dbcameras')
    idx = ET.SubElement(db, 'index2id')
    for cid in ['54138969', '55011271', '58860488', '60457274']:
        ET.SubElement(idx, 'elem').text = cid
    # w0: 4 cams x 11 subjects x 6 extrinsics = 264, then 4x9 intrinsics
    w0 = np.arange(1, 301, dtype=float) * 1e-3
    ET.SubElement(root, 'w0').text = \
        '[' + ' '.join(f'{v}' for v in w0) + ']'
    ET.ElementTree(root).write(path)


def test_preprocess_h36m_cameras_and_annotations(tmp_path):
    import preprocess_h36m as ph
    _h36m_metadata_xml(tmp_path / 'metadata.xml')
    h36m = ph.PreprocessH36m(str(tmp_path / 'metadata.xml'),
                             str(tmp_path / 'raw'),
                             extracted_dir=str(tmp_path / 'extracted'),
                             processed_dir=str(tmp_path / 'processed'),
                             sample_rate=2)
    assert h36m.sequence_mappings['S1'][('2', '1')] == 'Directions 1'
    cams = h36m.generate_cameras_file()
    cam = cams[('S1', h36m.camera_ids[0])]
    assert cam['R'].shape == (3, 3) and cam['w'] == 1000
    # R is a product of rotations -> orthonormal
    np.testing.assert_allclose(cam['R'] @ cam['R'].T, np.eye(3), atol=1e-8)

    # pose tracks as pre-converted npy (the no-spacepy path)
    rng = np.random.RandomState(0)
    n_frames = 4
    for sub in ['S1', 'S5', 'S6', 'S7', 'S8', 'S9', 'S11']:
        for name, d in [('D2_Positions', 2), ('D3_Positions_mono', 3)]:
            ddir = tmp_path / 'extracted' / sub / 'MyPoseFeatures' / name
            os.makedirs(ddir, exist_ok=True)
            for camid in h36m.camera_ids:
                for base in ['Directions 1', 'Directions']:
                    np.save(ddir / f'{base}.{camid}.npy',
                            rng.rand(1, n_frames, 32 * d) * 100)
    h36m.generate_annotations(write_images=False)
    out = (tmp_path / 'processed' / 'annotation_body3d' / 'fps25')
    train = np.load(out / 'h36m_train.npz')
    # 5 train subjects x 2 sequences x 4 cams x 2 sampled frames
    assert len(train['imgname']) == 5 * 2 * 4 * 2
    assert train['part'].shape[1:] == (17, 3)
    assert train['S'].shape[1:] == (17, 4)
    test = np.load(out / 'h36m_test.npz')
    assert len(test['imgname']) == 2 * 2 * 4 * 2
    with open(out / 'joint3d_rel_stats.pkl', 'rb') as f:
        st = pickle.load(f)
    assert st['mean'].shape == (16, 3)   # root-relative drops joint 0


def test_publish_model(tmp_path):
    import publish_model as pub
    from vitpose_tpu.utils.checkpoint import (load_params_npz,
                                              save_params_npz)
    variables = {'params': {'w': np.ones((3, 3), np.float32)},
                 'opt_state': {'mu': np.zeros(3, np.float32)}}
    save_params_npz(str(tmp_path / 'in.npz'), variables)
    final = pub.process_checkpoint(str(tmp_path / 'in.npz'),
                                   str(tmp_path / 'out.npz'))
    assert os.path.exists(final)
    assert os.path.basename(final).startswith('out-')
    restored = load_params_npz(final)
    assert 'opt_state' not in restored
    np.testing.assert_array_equal(restored['params']['w'], np.ones((3, 3)))

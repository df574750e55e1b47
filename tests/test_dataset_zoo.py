"""Dataset zoo: every COCO-format fixture loads through TopDownDataset with
its metadata (counterpart of reference tests/test_datasets/)."""
import os

import numpy as np
import pytest

from vitpose_tpu.data import TopDownDataset, DatasetInfo

DATA = "/root/reference/tests/data"

FIXTURES = [
    ('coco', f'{DATA}/coco/test_coco.json', f'{DATA}/coco/'),
    ('aic', f'{DATA}/aic/test_aic.json', f'{DATA}/aic/'),
    ('ochuman', f'{DATA}/ochuman/test_ochuman.json', f'{DATA}/ochuman/'),
    ('crowdpose', f'{DATA}/crowdpose/test_crowdpose.json',
     f'{DATA}/crowdpose/'),
    ('ap10k', f'{DATA}/ap10k/test_ap10k.json', f'{DATA}/ap10k/'),
    ('coco_wholebody', f'{DATA}/coco/test_coco_wholebody.json',
     f'{DATA}/coco/'),
    ('macaque', f'{DATA}/macaque/test_macaque.json', f'{DATA}/macaque/'),
    ('animalpose', f'{DATA}/animalpose/test_animalpose.json',
     f'{DATA}/animalpose/'),
    ('posetrack18', f'{DATA}/posetrack18/annotations/'
     'test_posetrack18_val.json', f'{DATA}/posetrack18/'),
    # face zoo
    ('300w', f'{DATA}/300w/test_300w.json', f'{DATA}/300w/'),
    ('aflw', f'{DATA}/aflw/test_aflw.json', f'{DATA}/aflw/'),
    ('cofw', f'{DATA}/cofw/test_cofw.json', f'{DATA}/cofw/'),
    ('wflw', f'{DATA}/wflw/test_wflw.json', f'{DATA}/wflw/'),
    # hand zoo (rhd fixture anns carry 7 of 21 kpts — not loadable)
    ('onehand10k', f'{DATA}/onehand10k/test_onehand10k.json',
     f'{DATA}/onehand10k/'),
    ('freihand2d', f'{DATA}/freihand/test_freihand.json',
     f'{DATA}/freihand/'),
    ('panoptic_hand2d', f'{DATA}/panoptic/test_panoptic.json',
     f'{DATA}/panoptic/'),
    # animal zoo
    ('horse10', f'{DATA}/horse10/test_horse10.json', f'{DATA}/horse10/'),
    ('fly', f'{DATA}/fly/test_fly.json', f'{DATA}/fly/'),
    ('locust', f'{DATA}/locust/test_locust.json', f'{DATA}/locust/'),
    ('zebra', f'{DATA}/zebra/test_zebra.json', f'{DATA}/zebra/'),
    ('atrw', f'{DATA}/atrw/test_atrw.json', f'{DATA}/atrw/'),
    # fashion / wholebody-adjacent
    ('deepfashion_full', f'{DATA}/fld/test_fld.json', f'{DATA}/fld/'),
    ('mhp', f'{DATA}/mhp/test_mhp.json', f'{DATA}/mhp/'),
    ('halpe', f'{DATA}/halpe/test_halpe.json', f'{DATA}/halpe/'),
]


@pytest.mark.parametrize('name,ann,prefix', FIXTURES,
                         ids=[f[0] for f in FIXTURES])
def test_dataset_loads(name, ann, prefix):
    if not os.path.exists(ann):
        pytest.skip(f'fixture {ann} missing')
    info = DatasetInfo.load(name)
    ds = TopDownDataset(ann, prefix, dataset_info=name)
    assert len(ds) > 0
    rec = ds[0]
    k = info.num_joints
    assert rec['joints_3d'].shape == (k, 3)
    assert rec['joints_3d_visible'].shape == (k, 3)
    # flip index is a valid permutation
    fi = info.flip_index
    assert sorted(fi.tolist()) == list(range(k))


def test_wholebody_keypoint_parsing():
    """COCO-WholeBody anns carry body+foot+face+hand keypoint groups; the
    133-kpt metadata must align with concatenated keypoints when present."""
    import json
    path = f'{DATA}/coco/test_coco_wholebody.json'
    if not os.path.exists(path):
        pytest.skip('missing fixture')
    d = json.load(open(path))
    ann = d['annotations'][0]
    assert 'foot_kpts' in ann or len(ann['keypoints']) == 133 * 3 \
        or len(ann['keypoints']) == 17 * 3


def test_camera_matches_reference():
    """SimpleCamera vs the reference numpy camera implementation."""
    import importlib.util
    import sys
    import types
    mmcv_utils = types.ModuleType('mmcv.utils')

    class _Registry:
        def __init__(self, *a, **k):
            pass

        def register_module(self, *a, **k):
            def deco(cls):
                return cls
            return deco

    mmcv_utils.Registry = _Registry
    sys.modules.setdefault('mmcv', types.ModuleType('mmcv'))
    sys.modules['mmcv.utils'] = mmcv_utils
    spec = importlib.util.spec_from_file_location(
        '_ref_cam_base',
        '/root/reference/mmpose/core/camera/camera_base.py')
    base = importlib.util.module_from_spec(spec)
    sys.modules['_ref_cam_base'] = base
    spec.loader.exec_module(base)
    src = open('/root/reference/mmpose/core/camera/single_camera.py').read()
    src = src.replace('from .camera_base import CAMERAS, SingleCameraBase',
                      'from _ref_cam_base import CAMERAS, SingleCameraBase')
    ns = {}
    exec(compile(src, 'single_camera', 'exec'), ns)
    RefCam = ns['SimpleCamera']

    rng = np.random.RandomState(0)
    q, _ = np.linalg.qr(rng.randn(3, 3))
    param = dict(R=q.astype(np.float32),
                 T=rng.randn(3, 1).astype(np.float32),
                 f=np.array([[1000.0], [990.0]], np.float32),
                 c=np.array([[512.0], [384.0]], np.float32),
                 k=rng.randn(3).astype(np.float32) * 0.01,
                 p=rng.randn(2).astype(np.float32) * 0.001)
    ref = RefCam(param)
    from vitpose_tpu.ops.camera import SimpleCamera
    ours = SimpleCamera(param)

    pts = rng.randn(5, 3).astype(np.float32) + np.array([0, 0, 5],
                                                        np.float32)
    np.testing.assert_allclose(np.asarray(ours.world_to_camera(pts)),
                               ref.world_to_camera(pts), rtol=1e-4,
                               atol=1e-4)
    cam_pts = ref.world_to_camera(pts)
    np.testing.assert_allclose(np.asarray(ours.camera_to_pixel(cam_pts)),
                               ref.camera_to_pixel(cam_pts), rtol=1e-3,
                               atol=1e-2)


def test_face_records_use_annotated_center_scale():
    """Face-zoo annotations carry explicit center/scale; records must keep
    them (x1.25 padding on the scalar scale) so the loader bypasses the
    bbox->cs derivation (reference face_300w_dataset.py:87-89)."""
    import json
    ann = f'{DATA}/300w/test_300w.json'
    if not os.path.exists(ann):
        pytest.skip('missing fixture')
    raw = json.load(open(ann))['annotations'][0]
    ds = TopDownDataset(ann, f'{DATA}/300w/', dataset_info='300w',
                        test_mode=True, use_gt_bbox=True)
    rec = ds.db[0]
    assert np.allclose(rec['center'], raw['center'])
    assert np.allclose(rec['scale'], np.array([raw['scale']] * 2) * 1.25)


def test_aflw_records_carry_box_size_for_nme():
    ann = f'{DATA}/aflw/test_aflw.json'
    if not os.path.exists(ann):
        pytest.skip('missing fixture')
    ds = TopDownDataset(ann, f'{DATA}/aflw/', dataset_info='aflw',
                        test_mode=True, use_gt_bbox=True)
    assert all('box_size' in r and r['box_size'] > 0 for r in ds.db)


def _fake_results(ds, noise=4.0, seed=0):
    rng = np.random.RandomState(seed)
    results = []
    for rec in ds.db:
        kp = np.zeros((ds.num_joints, 3), np.float32)
        kp[:, :2] = rec['joints_3d'][:, :2] + rng.randn(ds.num_joints, 2) \
            * noise
        kp[:, 2] = 0.9
        x, y, w, h = rec['bbox']
        results.append(dict(
            preds=kp[None],
            boxes=np.array([[x + w / 2, y + h / 2, w / 200, h / 200,
                             float(w * h), 1.0]]),
            image_paths=[rec['image_file']],
            bbox_ids=[rec['bbox_id']]))
    return results


def test_face_nme_protocols():
    """300W NME normalizes by inter-ocular distance (landmarks 36/45);
    AFLW by the annotated box_size — perfect predictions give NME 0, noisy
    ones a positive finite value."""
    for name, prefix in (('300w', f'{DATA}/300w/'),
                         ('aflw', f'{DATA}/aflw/')):
        ann = f'{prefix}test_{name}.json'
        if not os.path.exists(ann):
            pytest.skip('missing fixture')
        ds = TopDownDataset(ann, prefix, dataset_info=name, test_mode=True,
                            use_gt_bbox=True)
        stats0 = ds.evaluate(_fake_results(ds, noise=0.0), metric='NME')
        assert stats0['NME'] == pytest.approx(0.0, abs=1e-6)
        stats = ds.evaluate(_fake_results(ds, noise=5.0), metric='NME')
        assert 0 < stats['NME'] < 1.0, (name, stats)


def test_hand_pck_auc_epe_protocol():
    ann = f'{DATA}/onehand10k/test_onehand10k.json'
    if not os.path.exists(ann):
        pytest.skip('missing fixture')
    ds = TopDownDataset(ann, f'{DATA}/onehand10k/',
                        dataset_info='onehand10k', test_mode=True,
                        use_gt_bbox=True)
    stats = ds.evaluate(_fake_results(ds, noise=2.0),
                        metric=['PCK', 'AUC', 'EPE'])
    assert 0.0 < stats['PCK'] <= 1.0
    assert 0.0 < stats['AUC'] <= 1.0
    assert stats['EPE'] > 0.0


def test_crowdpose_evaluate_uses_crowd_protocol():
    """CrowdPose datasets must route mAP through the keypoints_crowd
    protocol: no-area OKS plus AP over easy/medium/hard crowdIndex subsets
    (reference topdown_crowdpose_dataset.py:95)."""
    ann = f'{DATA}/crowdpose/test_crowdpose.json'
    if not os.path.exists(ann):
        pytest.skip('missing fixture')
    ds = TopDownDataset(ann, f'{DATA}/crowdpose/',
                        dataset_info='crowdpose', test_mode=True,
                        use_gt_bbox=True)
    stats = ds.evaluate(_fake_results(ds, noise=1.0))
    assert {'AP', 'AP (E)', 'AP (M)', 'AP (H)'} <= set(stats)
    assert stats['AP'] > 0.5          # near-GT predictions


def test_wholebody_face_and_hand_subset_loading():
    """coco_wholebody_face / coco_wholebody_hand must read the PART's own
    keypoints and box (reference face_coco_wholebody_dataset.py /
    hand_coco_wholebody_dataset.py) — previously every annotation was
    silently dropped and the datasets were empty."""
    import json
    from vitpose_tpu.data import TopDownDataset

    ann_file = '/root/reference/tests/data/coco/test_coco_wholebody.json'
    prefix = '/root/reference/tests/data/coco/'
    raw = json.load(open(ann_file))

    face = TopDownDataset(ann_file, prefix,
                          dataset_info='coco_wholebody_face',
                          image_size=(256, 256), heatmap_size=(64, 64))
    n_face_valid = sum(1 for a in raw['annotations']
                       if a.get('face_valid')
                       and max(a.get('face_kpts', [0])) > 0)
    assert len(face) == n_face_valid > 0
    r = face.db[0]
    assert r['joints_3d'].shape == (68, 3)
    src = next(a for a in raw['annotations']
               if a.get('face_valid') and max(a['face_kpts']) > 0)
    np.testing.assert_allclose(r['bbox'][:2], src['face_box'][:2])

    hand = TopDownDataset(ann_file, prefix,
                          dataset_info='coco_wholebody_hand',
                          image_size=(256, 256), heatmap_size=(64, 64))
    n_hands = sum((1 if (a.get(f'{s}hand_valid')
                         and max(a.get(f'{s}hand_kpts', [0])) > 0) else 0)
                  for a in raw['annotations'] for s in ('left', 'right'))
    assert len(hand) == n_hands > 0
    assert hand.db[0]['joints_3d'].shape == (21, 3)


def test_multicategory_map_evaluates_every_species():
    """AP-10K-style multi-category jsons: detections must carry the GT
    record's category and the evaluator must score per category —
    previously every non-first species' GT was dropped and their
    predictions counted as false positives."""
    import json
    import tempfile
    from vitpose_tpu.data import TopDownDataset

    k = 5
    kp = lambda off: [float(10 + off), 20.0, 2.0] * k
    data = {
        'images': [{'id': 1, 'file_name': 'a.jpg', 'width': 100,
                    'height': 100},
                   {'id': 2, 'file_name': 'b.jpg', 'width': 100,
                    'height': 100}],
        'annotations': [
            {'id': 1, 'image_id': 1, 'category_id': 1, 'iscrowd': 0,
             'bbox': [5, 5, 40, 40], 'area': 1600, 'num_keypoints': k,
             'keypoints': kp(0)},
            {'id': 2, 'image_id': 2, 'category_id': 7, 'iscrowd': 0,
             'bbox': [5, 5, 40, 40], 'area': 1600, 'num_keypoints': k,
             'keypoints': kp(0)},
        ],
        'categories': [{'id': 1, 'name': 'cat'}, {'id': 7, 'name': 'dog'}],
    }
    from vitpose_tpu.data.dataset_info import DatasetInfo
    info = DatasetInfo(
        dataset_name='multispecies',
        keypoint_names=[str(i) for i in range(k)],
        keypoint_swap=[''] * k, keypoint_type=[''] * k,
        sigmas=np.full(k, 0.05), joint_weights=np.ones(k), skeleton=[])
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, 'ann.json')
        json.dump(data, open(p, 'w'))
        ds = TopDownDataset(p, td, dataset_info=info, test_mode=True,
                            use_gt_bbox=True)
        assert len(ds) == 2
        # perfect predictions for BOTH species
        results = []
        for rec in ds.db:
            preds = np.concatenate(
                [rec['joints_3d'][:, :2],
                 np.ones((k, 1), np.float32)], axis=1)[None]
            boxes = np.array([[*rec['center'], *rec['scale'], 1600.0, 0.9]]
                             if 'center' in rec else
                             [[0, 0, 1, 1, 1600.0, 0.9]], np.float32)
            c, s = rec.get('center'), rec.get('scale')
            if c is None:
                from vitpose_tpu.ops.geometry import bbox_xywh2cs
                c, s = bbox_xywh2cs(rec['bbox'], 1.0)
            results.append({
                'preds': preds,
                'boxes': np.array([[c[0], c[1], s[0], s[1], 1600.0, 0.9]],
                                  np.float32),
                'image_paths': [rec['image_file']],
                'bbox_ids': [rec['bbox_id']]})
        stats = ds.evaluate(results, metric='mAP')
        assert stats['AP'] > 0.99, stats

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

"""Multi-item / multitask pipeline utilities and IUV mesh supervision
(reference shared_transform.py:428-527, mesh_transform.py:35,171,199)."""
import types

import numpy as np

from ref_loader import _load


def _load_ref_shared_transform():
    class _Reg:
        def register_module(self, *a, **k):
            return lambda cls: cls

    fb = types.ModuleType('mmpose.datasets.builder')
    fb.PIPELINES = _Reg()
    mmcv = types.ModuleType('mmcv')
    mmcv.utils = types.ModuleType('mmcv.utils')
    mmcv.utils.build_from_cfg = lambda cfg, reg: cfg  # pipelines = callables
    mmcv.is_seq_of = lambda seq, t: True
    parallel = types.ModuleType('mmcv.parallel')
    parallel.DataContainer = object
    torchvision = types.ModuleType('torchvision')
    tv_transforms = types.ModuleType('torchvision.transforms')
    tv_transforms.functional = types.ModuleType(
        'torchvision.transforms.functional')
    torchvision.transforms = tv_transforms
    return _load(
        '/root/reference/mmpose/datasets/pipelines/shared_transform.py',
        'mmpose.datasets.pipelines.shared_transform_mt',
        pre_modules=[('mmcv', mmcv), ('mmcv.utils', mmcv.utils),
                     ('mmcv.parallel', parallel),
                     ('torchvision', torchvision),
                     ('torchvision.transforms', tv_transforms),
                     ('torchvision.transforms.functional',
                      tv_transforms.functional),
                     ('mmpose', types.ModuleType('mmpose')),
                     ('mmpose.datasets', types.ModuleType('mmpose.datasets')),
                     ('mmpose.datasets.builder', fb)])


def test_multi_item_process_merges_lists():
    from vitpose_tpu.data.pipeline import multi_item_process

    def fn(rec):
        return dict(img=rec['img'] * 2, idx=rec['idx'])

    items = {0: dict(img=np.ones(3), idx=0), 1: dict(img=np.full(3, 2.0),
                                                     idx=1)}
    out = multi_item_process(fn, items)
    assert [v.tolist() for v in out['img']] == [[2, 2, 2], [4, 4, 4]]
    assert out['idx'] == [0, 1]


def test_discard_duplicated_and_rename_match_reference():
    from vitpose_tpu.data.pipeline import (discard_duplicated_items,
                                           rename_keys)
    st = _load_ref_shared_transform()
    rec = dict(meta=[{'a': 1}, {'a': 1}], keep=[1, 2, 3], other=7)
    ref = st.DiscardDuplicatedItems(keys_list=['meta'])(dict(rec))
    got = discard_duplicated_items(rec, ['meta'])
    assert got['meta'] == ref['meta'] == {'a': 1}
    assert got['keep'] == [1, 2, 3] and got['other'] == 7

    rec2 = dict(old=5, stay=1)
    ref2 = st.RenameKeys([('old', 'new')])(dict(rec2))
    got2 = rename_keys(rec2, [('old', 'new')])
    assert got2 == ref2 == dict(stay=1, new=5)


def test_multitask_gather_target_matches_reference():
    from vitpose_tpu.data.pipeline import multitask_gather_target
    st = _load_ref_shared_transform()

    def heat_fn(rec):
        rec = dict(rec)
        rec['target'] = rec['joints'] * 2
        rec['target_weight'] = np.ones(3)
        return rec

    def reg_fn(rec):
        rec = dict(rec)
        rec['target'] = rec['joints'] + 1
        return rec

    rec = dict(joints=np.arange(3.0))
    # reference: Compose is stubbed to pass the callable through
    ref_obj = st.MultitaskGatherTarget([[heat_fn], [reg_fn]],
                                       pipeline_indices=[1, 0, 1])
    ref_obj.pipelines = [heat_fn, reg_fn]
    ref = ref_obj(dict(rec))
    got = multitask_gather_target([heat_fn, reg_fn], rec, indices=[1, 0, 1])
    for key in ('target', 'target_weight'):
        assert len(got[key]) == len(ref[key]) == 3
        for g, r in zip(got[key], ref[key]):
            if r is None:
                assert g is None
            else:
                np.testing.assert_allclose(g, r)


def test_iuv_roundtrip_and_flip_golden():
    import cv2
    from vitpose_tpu.data.mesh import load_iuv, flip_iuv, iuv_to_arrays
    rng = np.random.RandomState(0)
    iuv = rng.randint(0, 255, (16, 12, 3), np.uint8)

    # golden flip vs reference _flip_iuv (BF uv_type)
    mesh_mod = _load_ref_mesh_transform()
    ref_flip = mesh_mod._flip_iuv(iuv.copy(), 'BF')
    np.testing.assert_array_equal(flip_iuv(iuv), ref_flip)

    # file roundtrip through the BGR read convention
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, 'iuv.png')
        cv2.imwrite(path, iuv)
        loaded, has = load_iuv(path)
        assert has and np.array_equal(loaded, iuv)
        none_iuv, has0 = load_iuv(path, has_iuv=False)
        assert none_iuv is None and has0 == 0

    part, uv = iuv_to_arrays(iuv)
    assert part.shape == (1, 16, 12) and part.dtype == np.int64
    np.testing.assert_array_equal(part[0], iuv[:, :, 0])
    np.testing.assert_allclose(uv, iuv[:, :, 1:].transpose(2, 0, 1) / 255.0)
    part0, uv0 = iuv_to_arrays(None, iuv_size=(8, 8))
    assert part0.shape == (1, 8, 8) and not part0.any()
    assert uv0.shape == (2, 8, 8) and not uv0.any()


def _load_ref_mesh_transform():
    class _Reg:
        def register_module(self, *a, **k):
            return lambda cls: cls

    fb = types.ModuleType('mmpose.datasets.builder')
    fb.PIPELINES = _Reg()
    mmcv = types.ModuleType('mmcv')
    mmcv.imread = None
    from ref_loader import ref_post_transforms
    pt = ref_post_transforms()
    pp = types.ModuleType('mmpose.core.post_processing')
    for n in ('affine_transform', 'fliplr_joints', 'get_affine_transform'):
        setattr(pp, n, getattr(pt, n))
    return _load(
        '/root/reference/mmpose/datasets/pipelines/mesh_transform.py',
        'mmpose.datasets.pipelines.mesh_transform_iuv',
        pre_modules=[('mmcv', mmcv),
                     ('mmpose', types.ModuleType('mmpose')),
                     ('mmpose.core', types.ModuleType('mmpose.core')),
                     ('mmpose.core.post_processing', pp),
                     ('mmpose.datasets', types.ModuleType('mmpose.datasets')),
                     ('mmpose.datasets.builder', fb)])

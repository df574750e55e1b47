"""PAF target generation vs the reference PAFGenerator /
BottomUpGeneratePAFTarget (bottom_up_transform.py:268,663)."""
import types

import numpy as np

from ref_loader import ref_post_transforms, _load


def _load_ref_bottom_up_transform():
    pt = ref_post_transforms()
    fake_pp = types.ModuleType('mmpose.core.post_processing')
    for n in ('get_affine_transform', 'get_warp_matrix',
              'warp_affine_joints'):
        setattr(fake_pp, n, getattr(pt, n))

    class _Reg:
        def register_module(self, *a, **k):
            return lambda cls: cls

    fb = types.ModuleType('mmpose.datasets.builder')
    fb.PIPELINES = _Reg()
    pipelines_pkg = types.ModuleType('mmpose.datasets.pipelines')
    pipelines_pkg.__path__ = []
    shared = types.ModuleType('mmpose.datasets.pipelines.shared_transform')
    shared.Compose = lambda *a, **k: None
    return _load(
        '/root/reference/mmpose/datasets/pipelines/bottom_up_transform.py',
        'mmpose.datasets.pipelines.bottom_up_transform_paf',
        pre_modules=[('mmcv', types.ModuleType('mmcv')),
                     ('mmpose', types.ModuleType('mmpose')),
                     ('mmpose.core', types.ModuleType('mmpose.core')),
                     ('mmpose.core.post_processing', fake_pp),
                     ('mmpose.datasets', types.ModuleType('mmpose.datasets')),
                     ('mmpose.datasets.builder', fb),
                     ('mmpose.datasets.pipelines', pipelines_pkg),
                     ('mmpose.datasets.pipelines.shared_transform', shared)])


COCO_SKELETON = [[15, 13], [13, 11], [16, 14], [14, 12], [11, 12], [5, 11],
                 [6, 12], [5, 6], [5, 7], [6, 8], [7, 9], [8, 10], [1, 2],
                 [0, 1], [0, 2], [1, 3], [2, 4], [3, 5], [4, 6]]


def _random_people(rng, n_people, n_joints, w, h):
    joints = np.zeros((n_people, n_joints, 3), np.float32)
    joints[:, :, 0] = rng.uniform(-5, w + 5, (n_people, n_joints))
    joints[:, :, 1] = rng.uniform(-5, h + 5, (n_people, n_joints))
    joints[:, :, 2] = (rng.uniform(size=(n_people, n_joints)) > 0.25)
    return joints


def test_paf_golden_vs_reference():
    from vitpose_tpu.data.bottomup import generate_paf_targets
    mt = _load_ref_bottom_up_transform()
    rng = np.random.RandomState(0)
    for trial, (w, h, n_people, lw) in enumerate(
            [(32, 24, 1, 1), (48, 64, 3, 5), (40, 40, 4, 3)]):
        joints = _random_people(rng, n_people, 17, w, h)
        ref_gen = mt.PAFGenerator(np.array([w, h]), lw, COCO_SKELETON)
        ref = ref_gen(joints)
        got = generate_paf_targets(joints, (w, h), lw, COCO_SKELETON)
        np.testing.assert_allclose(got, ref, atol=1e-6), trial


def test_paf_degenerate_cases():
    """Zero-length limbs count toward normalization; invisible joints are
    skipped entirely."""
    from vitpose_tpu.data.bottomup import generate_paf_targets
    mt = _load_ref_bottom_up_transform()
    skeleton = [[0, 1], [1, 2]]
    joints = np.array([
        # zero-length limb 0; limb 1 has an invisible endpoint
        [[10., 10., 1.], [10., 10., 1.], [20., 5., 0.]],
        # a regular diagonal limb + one fully off-map (window clipping)
        [[2., 2., 1.], [28., 20., 1.], [100., 100., 1.]],
    ], np.float32)
    ref = mt.PAFGenerator(np.array([32, 24]), 2, skeleton)(joints)
    got = generate_paf_targets(joints, (32, 24), 2, skeleton)
    np.testing.assert_allclose(got, ref, atol=1e-6)
    # person 1's limb 0 is zero-length: it increments the normalization
    # count without adding any vector, so the map stays finite and zero
    # where only that person covers it
    assert np.isfinite(got).all()


def test_paf_multiscale_shapes():
    from vitpose_tpu.data.bottomup import generate_paf_targets_multiscale
    rng = np.random.RandomState(1)
    joints_s0 = _random_people(rng, 2, 17, 32, 24)
    joints_s1 = joints_s0.copy()
    joints_s1[:, :, :2] *= 2
    out = generate_paf_targets_multiscale(
        [joints_s0, joints_s1], [(32, 24), (64, 48)], 3, COCO_SKELETON)
    assert out[0].shape == (38, 24, 32)
    assert out[1].shape == (38, 48, 64)
    assert all(np.isfinite(o).all() for o in out)


def test_heatmap_targets_golden_vs_reference():
    """generate_heatmap_targets == reference HeatmapGenerator (biased and
    UDP), including truncated-int centers, window clipping at borders,
    off-map skipping, and max-over-people accumulation."""
    from vitpose_tpu.data.bottomup import generate_heatmap_targets
    mt = _load_ref_bottom_up_transform()
    rng = np.random.RandomState(2)
    for w, h, n_people, sigma in [(32, 24, 1, 2.0), (48, 64, 3, 2.0),
                                  (40, 40, 4, 3.0), (64, 64, 2, -1)]:
        joints = _random_people(rng, n_people, 17, w, h)
        for use_udp in (False, True):
            ref_gen = mt.HeatmapGenerator(np.array([w, h]), 17,
                                          sigma=sigma, use_udp=use_udp)
            ref = ref_gen(joints)
            got = generate_heatmap_targets(joints, (w, h), sigma=sigma,
                                           use_udp=use_udp)
            np.testing.assert_allclose(got, ref, atol=5e-6,
                                       err_msg=str((w, h, sigma, use_udp)))


def test_heatmap_targets_multiscale():
    """BottomUpGenerateHeatmapTarget counterpart: per-scale maps from
    per-scale joints (reference bottom_up_transform.py:595-608)."""
    from vitpose_tpu.data.bottomup import generate_heatmap_targets_multiscale
    mt = _load_ref_bottom_up_transform()
    rng = np.random.RandomState(3)
    joints_s0 = _random_people(rng, 2, 17, 128, 128)
    joints_s1 = joints_s0.copy()
    joints_s1[:, :, :2] *= 2
    out = generate_heatmap_targets_multiscale(
        [joints_s0, joints_s1], [128, 256], sigma=2.0)
    assert out[0].shape == (17, 128, 128) and out[1].shape == (17, 256, 256)
    for joints, size, got in [(joints_s0, 128, out[0]),
                              (joints_s1, 256, out[1])]:
        ref = mt.HeatmapGenerator(np.array([size, size]), 17,
                                  sigma=2.0)(joints)
        np.testing.assert_allclose(got, ref, atol=1e-6)

"""Golden tests: heatmap target generation vs the reference pipeline."""
import numpy as np
import pytest

from vitpose_tpu.ops import target as T

from ref_loader import ref_top_down_transform

RNG = np.random.RandomState(1)

CFG = dict(
    num_joints=17,
    image_size=np.array([192, 256]),
    heatmap_size=np.array([48, 64]),
    joint_weights=np.ones((17, 1), dtype=np.float32),
    use_different_joint_weights=False,
)


def rand_joints(frac_outside=0.15):
    joints = np.zeros((17, 3), dtype=np.float32)
    joints[:, 0] = RNG.uniform(-20, 212, size=17)
    joints[:, 1] = RNG.uniform(-20, 276, size=17)
    # clamp most inside
    inside = RNG.rand(17) > frac_outside
    joints[inside, 0] = RNG.uniform(0, 191, size=inside.sum())
    joints[inside, 1] = RNG.uniform(0, 255, size=inside.sum())
    vis = np.zeros((17, 3), dtype=np.float32)
    v = (RNG.rand(17) > 0.2).astype(np.float32)
    vis[:, 0] = v
    vis[:, 1] = v
    return joints, vis


def _ref_gen(encoding, joints, vis, unbiased=False, sigma=2):
    ref = ref_top_down_transform()
    gen = ref.TopDownGenerateTarget(sigma=sigma, encoding=encoding,
                                    unbiased_encoding=unbiased,
                                    target_type='GaussianHeatmap')
    results = dict(joints_3d=joints.copy(), joints_3d_visible=vis.copy(),
                   ann_info=dict(CFG))
    out = gen(results)
    return out['target'], out['target_weight']


@pytest.mark.parametrize("unbiased", [False, True])
def test_msra_target_matches_reference(unbiased):
    for _ in range(5):
        joints, vis = rand_joints()
        t_ref, w_ref = _ref_gen('MSRA', joints, vis, unbiased=unbiased)
        t, w = T.generate_msra_heatmaps(joints[:, :2], vis[:, 0],
                                        (192, 256), (48, 64), sigma=2.0,
                                        unbiased=unbiased)
        np.testing.assert_allclose(np.asarray(w)[:, None], w_ref, atol=1e-6)
        np.testing.assert_allclose(np.asarray(t), t_ref, atol=1e-5)


def test_udp_target_matches_reference():
    for _ in range(5):
        joints, vis = rand_joints()
        t_ref, w_ref = _ref_gen('UDP', joints, vis)
        t, w = T.generate_udp_heatmaps(joints[:, :2], vis[:, 0],
                                       (192, 256), (48, 64), sigma=2.0)
        np.testing.assert_allclose(np.asarray(w)[:, None], w_ref, atol=1e-6)
        np.testing.assert_allclose(np.asarray(t), t_ref, atol=1e-5)


def test_udp_combined_target_matches_reference():
    ref = ref_top_down_transform()
    gen = ref.TopDownGenerateTarget(encoding='UDP',
                                    target_type='CombinedTarget',
                                    valid_radius_factor=0.0546875)
    for _ in range(3):
        joints, vis = rand_joints()
        results = dict(joints_3d=joints.copy(), joints_3d_visible=vis.copy(),
                       ann_info=dict(CFG))
        out = gen(results)
        t_ref = out['target']
        t, w = T.generate_combined_target(joints[:, :2], vis[:, 0],
                                          (192, 256), (48, 64))
        t = np.asarray(t).reshape(17 * 3, 64, 48)
        np.testing.assert_allclose(t, t_ref, atol=1e-5)


def test_batched_targets_vectorize():
    joints = RNG.uniform(0, 190, size=(4, 17, 2)).astype(np.float32)
    vis = np.ones((4, 17), dtype=np.float32)
    t, w = T.generate_udp_heatmaps(joints, vis, (192, 256), (48, 64))
    assert t.shape == (4, 17, 64, 48)
    assert w.shape == (4, 17)


def test_megvii_target_golden():
    """generate_megvii_heatmaps vs the reference _megvii_generate_target."""
    import numpy as np
    from ref_loader import ref_top_down_transform
    from vitpose_tpu.ops.target import generate_megvii_heatmaps
    tdt = ref_top_down_transform()
    gen = tdt.TopDownGenerateTarget(kernel=(11, 11), encoding='Megvii')
    rng = np.random.RandomState(3)
    K = 17
    cfg = dict(num_joints=K, image_size=np.array([192, 256]),
               heatmap_size=np.array([48, 64]),
               joint_weights=np.ones((K, 1), np.float32),
               use_different_joint_weights=False)
    joints = np.zeros((K, 3), np.float32)
    joints[:, 0] = rng.uniform(-10, 200, K)
    joints[:, 1] = rng.uniform(-10, 266, K)
    vis = np.zeros((K, 3), np.float32)
    vis[:, 0] = (rng.rand(K) > 0.2).astype(np.float32)
    results = dict(joints_3d=joints, joints_3d_visible=vis, ann_info=cfg)
    out = gen(dict(results))
    ref_t, ref_w = out['target'], out['target_weight']
    ours_t, ours_w = generate_megvii_heatmaps(
        joints[:, :2], vis[:, 0], (192, 256), (48, 64), kernel=11)
    np.testing.assert_allclose(np.asarray(ours_w)[:, None], ref_w)
    np.testing.assert_allclose(np.asarray(ours_t), ref_t, rtol=1e-4,
                               atol=1e-3)

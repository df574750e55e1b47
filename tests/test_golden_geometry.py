"""Golden tests: vitpose_tpu.ops.geometry vs the reference implementation."""
import numpy as np
import pytest

from vitpose_tpu.ops import geometry as G

from ref_loader import ref_post_transforms, ref_top_down_transform

RNG = np.random.RandomState(0)


def rand_cs(n):
    center = RNG.uniform(50, 400, size=(n, 2)).astype(np.float32)
    scale = RNG.uniform(0.5, 3.0, size=(n, 2)).astype(np.float32)
    return center, scale


def test_bbox_xywh2cs_matches_reference():
    ref = ref_top_down_transform()
    for _ in range(20):
        bbox = RNG.uniform(0, 300, size=4).astype(np.float32)
        bbox[2:] = RNG.uniform(10, 200, size=2)
        c_ref, s_ref = ref.bbox_xywh2cs(bbox, aspect_ratio=192 / 256,
                                        padding=1.25)
        c, s = G.bbox_xywh2cs(bbox, aspect_ratio=192 / 256, padding=1.25)
        np.testing.assert_allclose(np.asarray(c), c_ref, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(s), s_ref, rtol=1e-5)


@pytest.mark.parametrize("rot", [0.0, 30.0, -75.0, 180.0])
@pytest.mark.parametrize("shift", [(0.0, 0.0), (0.1, -0.05)])
def test_affine_matrix_matches_cv2_construction(rot, shift):
    ref = ref_post_transforms()
    center, scale = rand_cs(8)
    for i in range(8):
        m_ref = ref.get_affine_transform(center[i], scale[i], rot,
                                         (192, 256), shift=shift)
        m = np.asarray(G.affine_matrix(center[i], scale[i], rot, (192, 256),
                                       shift=shift))
        np.testing.assert_allclose(m, m_ref, rtol=1e-4, atol=1e-3)
        m_inv_ref = ref.get_affine_transform(center[i], scale[i], rot,
                                             (192, 256), shift=shift,
                                             inv=True)
        m_inv = np.asarray(G.affine_matrix(center[i], scale[i], rot,
                                           (192, 256), shift=shift, inv=True))
        np.testing.assert_allclose(m_inv, m_inv_ref, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("rot", [0.0, 25.0, -40.0])
def test_udp_warp_matrix_matches_reference(rot):
    ref = ref_post_transforms()
    center, scale = rand_cs(8)
    image_size = np.array([192, 256], dtype=np.float32)
    m = np.asarray(G.udp_warp_matrix(rot, center, scale, (192, 256)))
    for i in range(8):
        m_ref = ref.get_warp_matrix(rot, center[i] * 2.0, image_size - 1.0,
                                    scale[i] * 200.0)
        np.testing.assert_allclose(m[i], m_ref, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("use_udp", [False, True])
def test_transform_preds_matches_reference(use_udp):
    ref = ref_post_transforms()
    center, scale = rand_cs(6)
    coords = RNG.uniform(0, 48, size=(6, 17, 2)).astype(np.float32)
    out = np.asarray(G.transform_preds(coords, center, scale, (48, 64),
                                       use_udp=use_udp))
    for i in range(6):
        ref_out = ref.transform_preds(coords[i].copy(), center[i].copy(),
                                      scale[i].copy(), [48, 64],
                                      use_udp=use_udp)
        np.testing.assert_allclose(out[i], ref_out, rtol=1e-4, atol=1e-3)


COCO_FLIP_PAIRS = [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12],
                   [13, 14], [15, 16]]


def test_fliplr_joints_matches_reference():
    ref = ref_post_transforms()
    joints = RNG.uniform(0, 192, size=(17, 3)).astype(np.float32)
    vis = (RNG.rand(17, 1) > 0.3).astype(np.float32)
    vis = np.repeat(vis, 3, axis=1)
    j_ref, v_ref = ref.fliplr_joints(joints.copy(), vis.copy(), 192,
                                     COCO_FLIP_PAIRS)
    flip_index = G.flip_index_from_pairs(COCO_FLIP_PAIRS, 17)
    j, v = G.fliplr_joints(joints, vis, 192, flip_index)
    np.testing.assert_allclose(np.asarray(j), j_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(v), v_ref, rtol=1e-5)


@pytest.mark.parametrize("target_type", ["GaussianHeatmap", "CombinedTarget"])
def test_flip_back_matches_reference(target_type):
    ref = ref_post_transforms()
    k = 17 * 3 if target_type == "CombinedTarget" else 17
    hm = RNG.rand(2, k, 64, 48).astype(np.float32)
    out_ref = ref.flip_back(hm.copy(), COCO_FLIP_PAIRS,
                            target_type=target_type)
    flip_index = G.flip_index_from_pairs(COCO_FLIP_PAIRS, 17)
    out = np.asarray(G.flip_back(hm, flip_index, target_type=target_type))
    np.testing.assert_allclose(out, out_ref, rtol=1e-5)


def test_invert_affine_roundtrip():
    center, scale = rand_cs(4)
    m = G.affine_matrix(center, scale, 33.0, (192, 256))
    minv = G.invert_affine(m)
    pts = RNG.uniform(0, 200, size=(4, 5, 2)).astype(np.float32)
    back = G.apply_affine_to_points(G.apply_affine_to_points(pts, m), minv)
    np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-3, atol=1e-2)

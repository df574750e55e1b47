"""Golden tests: on-device decode vs the reference numpy/cv2 implementation."""
import cv2
import numpy as np
import pytest

from vitpose_tpu.ops import decode as D

from ref_loader import ref_top_down_eval

RNG = np.random.RandomState(2)


def make_heatmaps(n=4, k=17, h=64, w=48, sigma=2.0):
    """Gaussian-blob heatmaps with noise, like real model output."""
    hm = np.zeros((n, k, h, w), dtype=np.float32)
    ys, xs = np.mgrid[0:h, 0:w]
    for i in range(n):
        for j in range(k):
            cx = RNG.uniform(3, w - 4)
            cy = RNG.uniform(3, h - 4)
            hm[i, j] = np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2)
                              / (2 * sigma ** 2))
    hm += RNG.uniform(0, 0.01, size=hm.shape).astype(np.float32)
    return hm


def rand_cs(n):
    center = RNG.uniform(50, 400, size=(n, 2)).astype(np.float32)
    scale = RNG.uniform(0.5, 3.0, size=(n, 2)).astype(np.float32)
    return center, scale


@pytest.mark.parametrize("ksize", [3, 5, 7, 11, 17, 23])
def test_gaussian_kernel_matches_cv2(ksize):
    ref = cv2.getGaussianKernel(ksize, 0).flatten()
    ours = D.gaussian_kernel1d(ksize)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("ksize", [3, 11])
def test_blur_reflect_matches_cv2(ksize):
    hm = make_heatmaps(1, 3)
    ours = np.asarray(D.gaussian_blur_reflect(hm, ksize))
    for j in range(3):
        ref = cv2.GaussianBlur(hm[0, j].copy(), (ksize, ksize), 0)
        np.testing.assert_allclose(ours[0, j], ref, rtol=1e-4, atol=1e-6)


def test_gaussian_modulate_matches_reference():
    ref_mod = ref_top_down_eval()
    hm = make_heatmaps(2, 5)
    ours = np.asarray(D.gaussian_modulate(hm, 11))
    ref = ref_mod._gaussian_blur(hm.copy(), 11)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-5)


def test_argmax_decode_matches_reference():
    ref_mod = ref_top_down_eval()
    hm = make_heatmaps()
    preds_ref, maxvals_ref = ref_mod._get_max_preds(hm.copy())
    coords, maxvals = D.heatmaps_to_coords(hm)
    np.testing.assert_allclose(np.asarray(coords), preds_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(maxvals), maxvals_ref, atol=1e-6)


@pytest.mark.parametrize("post_process", [None, "default", "unbiased"])
def test_keypoints_from_heatmaps_matches_reference(post_process):
    ref_mod = ref_top_down_eval()
    hm = make_heatmaps()
    center, scale = rand_cs(4)
    preds_ref, maxvals_ref = ref_mod.keypoints_from_heatmaps(
        hm.copy(), center.copy(), scale.copy(), post_process=post_process)
    preds, maxvals = D.keypoints_from_heatmaps(
        hm, center, scale, post_process=post_process)
    np.testing.assert_allclose(np.asarray(maxvals), maxvals_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(preds), preds_ref,
                               rtol=1e-3, atol=2e-2)


def test_keypoints_from_heatmaps_udp_matches_reference():
    ref_mod = ref_top_down_eval()
    hm = make_heatmaps()
    center, scale = rand_cs(4)
    preds_ref, maxvals_ref = ref_mod.keypoints_from_heatmaps(
        hm.copy(), center.copy(), scale.copy(), post_process="default",
        use_udp=True, target_type="GaussianHeatmap", kernel=11)
    preds, maxvals = D.keypoints_from_heatmaps(
        hm, center, scale, post_process="default", use_udp=True,
        target_type="GaussianHeatmap", kernel=11)
    np.testing.assert_allclose(np.asarray(maxvals), maxvals_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(preds), preds_ref,
                               rtol=1e-3, atol=5e-2)


def test_keypoints_from_heatmaps_megvii_matches_reference():
    ref_mod = ref_top_down_eval()
    hm = make_heatmaps()
    center, scale = rand_cs(4)
    preds_ref, maxvals_ref = ref_mod.keypoints_from_heatmaps(
        hm.copy(), center.copy(), scale.copy(), post_process="megvii",
        kernel=11)
    preds, maxvals = D.keypoints_from_heatmaps(
        hm, center, scale, post_process="megvii", kernel=11)
    np.testing.assert_allclose(np.asarray(maxvals), maxvals_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(preds), preds_ref,
                               rtol=1e-3, atol=5e-2)


def test_combined_target_decode_matches_reference():
    ref_mod = ref_top_down_eval()
    # build combined-target style maps: response + offsets.
    # N=1 because the reference's offset-gather only broadcasts for N==1
    # (top_down_eval.py:583); our batched version generalizes it.
    n, k = 1, 3
    hm = RNG.uniform(0, 1, size=(n, 3 * k, 64, 48)).astype(np.float32)
    center, scale = rand_cs(n)
    preds_ref, maxvals_ref = ref_mod.keypoints_from_heatmaps(
        hm.copy(), center.copy(), scale.copy(), post_process="default",
        use_udp=True, target_type="CombinedTarget", kernel=11)
    preds, maxvals = D.keypoints_from_heatmaps(
        hm, center, scale, post_process="default", use_udp=True,
        target_type="CombinedTarget", kernel=11)
    np.testing.assert_allclose(np.asarray(maxvals), maxvals_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(preds), preds_ref,
                               rtol=1e-3, atol=5e-2)


def test_border_keypoints_match_reference():
    """Border argmax positions: the reference gates both the ±0.25 shift
    AND megvii's +0.5 behind `1 < p < size-1` (top_down_eval.py:605-612)
    — border keypoints receive neither."""
    ref_mod = ref_top_down_eval()
    n, k, h, w = 1, 8, 64, 48
    hm = np.random.RandomState(3).uniform(
        0, 0.01, size=(n, k, h, w)).astype(np.float32)
    spots = [(0, 0), (1, 1), (w - 1, h - 1), (w - 2, h - 2),
             (0, 30), (w - 1, 2), (25, 0), (20, h - 1)]
    for j, (px, py) in enumerate(spots):
        hm[0, j, py, px] = 1.0
    center, scale = rand_cs(n)
    for pp in ("default", "megvii"):
        preds_ref, maxvals_ref = ref_mod.keypoints_from_heatmaps(
            hm.copy(), center.copy(), scale.copy(), post_process=pp,
            kernel=11)
        preds, maxvals = D.keypoints_from_heatmaps(
            hm, center, scale, post_process=pp, kernel=11)
        np.testing.assert_allclose(np.asarray(preds), preds_ref,
                                   rtol=1e-3, atol=5e-2, err_msg=pp)
        np.testing.assert_allclose(np.asarray(maxvals), maxvals_ref,
                                   atol=1e-4)


@pytest.mark.parametrize("hw", [(16, 12), (64, 48), (96, 72), (64, 64)])
def test_decode_size_sweep_matches_reference(hw):
    """Decode parity across heatmap geometries (the zoo spans 48x64,
    64x64, 72x96, 16x12 tiny smoke shapes) for the three main
    post-process modes + UDP — size-dependent gather/border bugs would
    hide in a single-geometry golden."""
    ref_mod = ref_top_down_eval()
    h, w = hw
    rng = np.random.RandomState(h * 7 + w)
    n, k = 2, 6
    hm = np.zeros((n, k, h, w), np.float32)
    ys, xs = np.mgrid[0:h, 0:w]
    for i in range(n):
        for j in range(k):
            cx, cy = rng.uniform(0, w - 1), rng.uniform(0, h - 1)
            hm[i, j] = np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / 8.0)
    hm += rng.uniform(0, 0.01, hm.shape).astype(np.float32)
    center = rng.uniform(50, 400, (n, 2)).astype(np.float32)
    scale = rng.uniform(0.5, 2.0, (n, 2)).astype(np.float32)
    for pp, udp in (("default", False), ("unbiased", False),
                    ("megvii", False), ("default", True)):
        preds_ref, maxvals_ref = ref_mod.keypoints_from_heatmaps(
            hm.copy(), center.copy(), scale.copy(), post_process=pp,
            kernel=11, use_udp=udp)
        preds, maxvals = D.keypoints_from_heatmaps(
            hm, center, scale, post_process=pp, kernel=11, use_udp=udp)
        np.testing.assert_allclose(np.asarray(preds), preds_ref,
                                   rtol=1e-3, atol=0.1,
                                   err_msg=f"{pp} udp={udp} {hw}")
        np.testing.assert_allclose(np.asarray(maxvals), maxvals_ref,
                                   atol=1e-4)

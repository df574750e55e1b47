"""Host metrics golden tests + bottom-up API smoke."""
import numpy as np
import pytest

from ref_loader import ref_top_down_eval


def data(n=6, k=10):
    rng = np.random.RandomState(5)
    pred = rng.uniform(0, 100, (n, k, 2)).astype(np.float32)
    gt = pred + rng.randn(n, k, 2).astype(np.float32) * 5
    mask = rng.rand(n, k) > 0.2
    norm = rng.uniform(50, 100, (n, 2)).astype(np.float32)
    return pred, gt, mask, norm


def test_pck_auc_nme_epe_golden():
    from vitpose_tpu.ops.decode import (keypoint_pck_accuracy, keypoint_auc,
                                        keypoint_nme, keypoint_epe)
    ref = ref_top_down_eval()
    pred, gt, mask, norm = data()
    a_ref = ref.keypoint_pck_accuracy(pred, gt, mask, 0.1, norm.copy())
    a = keypoint_pck_accuracy(pred, gt, mask, 0.1, norm.copy())
    np.testing.assert_allclose(a[0], a_ref[0], atol=1e-6)
    assert abs(a[1] - a_ref[1]) < 1e-6 and a[2] == a_ref[2]

    assert abs(keypoint_auc(pred, gt, mask, 60.0)
               - ref.keypoint_auc(pred, gt, mask, 60.0)) < 1e-6
    assert abs(keypoint_nme(pred, gt, mask, norm.copy())
               - ref.keypoint_nme(pred, gt, mask, norm.copy())) < 1e-5
    assert abs(keypoint_epe(pred, gt, mask)
               - ref.keypoint_epe(pred, gt, mask)) < 1e-4


def test_bottomup_inference_api():
    import jax
    from vitpose_tpu.api.inference import inference_bottom_up_pose_model
    from vitpose_tpu.models.bottomup import BottomUpEstimator
    from vitpose_tpu.models.vit import ViTConfig
    from vitpose_tpu.data import DatasetInfo

    bb = ViTConfig(img_size=(128, 128), embed_dim=32, depth=2, num_heads=4)
    est = BottomUpEstimator(bb, num_joints=17,
                            dataset_info=DatasetInfo.load('coco'))
    rng = jax.random.PRNGKey(0)
    import jax.numpy as jnp
    variables = est.init(rng, jnp.zeros((1, 128, 128, 3)))
    img = np.random.RandomState(0).randint(
        0, 255, (240, 320, 3), np.uint8)
    results, _ = inference_bottom_up_pose_model(est, variables, img,
                                                base_size=128)
    for r in results:
        assert r['keypoints'].shape[1] == 3
        assert np.isfinite(r['keypoints']).all()


def test_bottom_up_api_decode_center_nonsquare():
    """inference_bottom_up_pose_model must decode around the CANVAS
    center (the square [0, max(h,w)]² the top-left paste covers), not the
    image center — a known heatmap peak must map back to its original
    image location for a non-square image."""
    from types import SimpleNamespace
    import vitpose_tpu.api.inference as api
    from vitpose_tpu.models.bottomup import BottomUpEstimator, HeatmapParser
    from vitpose_tpu.data import DatasetInfo

    info = DatasetInfo.load('coco')
    h, w, base = 480, 640, 128
    hm_size = base // 4                          # 32
    k = 17
    # a person at original coords (x0, y0): peak cell in heatmap grid
    x0, y0 = 320.0, 120.0
    sf = base / max(h, w)                        # canvas scale
    px, py = int(round(x0 * sf / 4)), int(round(y0 * sf / 4))
    heatmaps = np.zeros((1, k, hm_size, hm_size), np.float32)
    tags = np.zeros((1, k, hm_size, hm_size), np.float32)
    heatmaps[0, :, py, px] = 1.0
    tags[0, :, py, px] = 0.5

    real = BottomUpEstimator.__new__(BottomUpEstimator)
    parser = HeatmapParser(num_joints=k, max_num_people=5, tag_per_joint=True,
                           detection_threshold=0.1)
    est = SimpleNamespace(
        num_joints=k, dataset_info=info,
        infer=lambda v, x, fi: (heatmaps, tags),
        parse=lambda hm, tg, c, s: BottomUpEstimator.parse(
            SimpleNamespace(parser=parser), hm, tg, c, s))
    img = np.zeros((h, w, 3), np.uint8)
    results, _ = api.inference_bottom_up_pose_model(est, {}, img,
                                                    dataset_info=info,
                                                    base_size=base)
    assert results, 'peak not grouped'
    kp = results[0]['keypoints']
    # grid quantization + the ±0.25 adjust step allow a few px of slack
    cell = max(h, w) / hm_size                   # px per heatmap cell
    assert abs(kp[0, 0] - x0) <= cell, (kp[0], x0, y0)
    assert abs(kp[0, 1] - y0) <= cell, (kp[0], x0, y0)

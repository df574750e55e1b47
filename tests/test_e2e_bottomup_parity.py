"""End-to-end bottom-up parity vs the reference AE test protocol.

The full post-network bottom-up stack — multi-scale resize-align
(reference bottom_up_transform.py:91 `_resize_align_multi_scale(_udp)` +
BottomUpGetImgSize base_size/center/scale at current_scale=1,
bottom_up_transform.py:706), flip/stage/scale aggregation
(core/evaluation/bottom_up_eval.py), HeatmapParser grouping
(core/post_processing/group.py) and `get_group_preds` coordinate
mapping — is composed here from ACTUAL reference modules, driven by the
same network, and must produce keypoints identical to one call of
`inference_bottom_up_multi_scale` (the rebuild of
associative_embedding.py:201 `forward_test`).

The network is a deterministic stub painting well-separated Gaussian
peaks + tag plateaus (a random-weight CNN makes grouping chaotic: ~300
borderline noise "people" flip on the ~1e-7 fp difference between
jax.image.resize and torch F.interpolate; network-conversion parity is
covered separately by tests/test_cnn_parity.py). Fails if ANY protocol
convention drifts: canvas warp, base-size projection, flip averaging,
tag concat order, grouping thresholds, or center/scale frames.
"""
import numpy as np
import pytest
import torch

from ref_cnn_loader import (ref_bottom_up_transform, ref_bottom_up_eval,
                            ref_group)
from vitpose_tpu.data import DatasetInfo
from vitpose_tpu.ops.group import HeatmapParser

IMG = '/root/reference/tests/data/coco/000000000785.jpg'
K = 17

_rng = np.random.RandomState(7)
# 3 people clustered around distinct centers, joints jittered inside;
# the extra irrational-ish per-joint offset keeps peaks off integer /
# half-integer subpixel positions, where the 4x bilinear upsample creates
# EXACTLY equal adjacent pixels and top-k tie-break order (torch vs jax,
# both unspecified) would decide the adjust direction
_FX = np.clip(np.array([[0.22], [0.52], [0.80]])
              + _rng.uniform(-0.08, 0.08, (3, K))
              + 0.00173 * (np.arange(K) + 1), 0.06, 0.94)
_FY = np.clip(np.array([[0.30], [0.55], [0.72]])
              + _rng.uniform(-0.10, 0.10, (3, K))
              + 0.00119 * (np.arange(K) + 1), 0.06, 0.94)


class _StubEstimator:
    """BottomUpEstimator-shaped network with a deterministic forward:
    K Gaussian heatmaps + K tag maps at fixed fractional positions
    (proportional across canvas scales), 2K channels NHWC at stride 4."""
    num_joints = K
    _multi_stage = False
    head = None

    def __init__(self, use_udp=False):
        self.dataset_info = DatasetInfo.load('coco')
        # mirrors how configs build BottomUpEstimator: parser_cfg carries
        # use_udp for the UDP adjust convention
        self.parser = HeatmapParser(num_joints=K, max_num_people=30,
                                    nms_kernel=5, detection_threshold=0.1,
                                    tag_threshold=1.0, use_udp=use_udp)

    def init(self, *a, **k):
        return {}

    def apply(self, variables, x):
        x = np.asarray(x)
        b, h, w, _ = x.shape
        hh, ww = h // 4, w // 4
        ys, xs = np.mgrid[0:hh, 0:ww].astype(np.float32)
        sigma = 2.0 * ww / 32.0
        hm = np.zeros((hh, ww, K), np.float32)
        tg = np.zeros((hh, ww, K), np.float32)
        for p in range(3):
            amp = 1.0 - 0.12 * p
            for j in range(K):
                cx, cy = _FX[p, j] * ww, _FY[p, j] * hh
                g = amp * np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2)
                                 / (2 * sigma ** 2))
                keep = g > hm[..., j]
                hm[..., j] = np.where(keep, g, hm[..., j])
                tg[..., j] = np.where(g > 0.5 * amp, 2.0 * p + 1.0,
                                      tg[..., j])
        # flip-EQUIVARIANCE: a flipped canvas yields the exactly-mirrored,
        # channel-swapped maps (array reversal is fp-exact), so the flip
        # branch cancels perfectly after flip_feature_maps. Without this
        # the flip-average builds mirror-symmetric maps whose EXACT value
        # ties make top-k order (unspecified in both torch and jax) decide
        # the result. Orientation is detected from the canvas content.
        col = x.sum(axis=(0, 1, 3))
        wgt = (col - col.mean()) ** 2
        centroid = float((wgt * np.arange(w)).sum() / wgt.sum())
        if centroid > (w - 1) / 2.0:
            fi = np.asarray(self.dataset_info.flip_index)
            hm = hm[:, ::-1, :][:, :, fi]
            tg = tg[:, ::-1, :][:, :, fi]
        return np.broadcast_to(
            np.concatenate([hm, tg], -1)[None], (b, hh, ww, 2 * K)).copy()


def _forward(est, canvas):
    """Shared network: canvas -> list of torch NCHW outputs (the reference
    side consumes the same stub forward the jax pipeline runs)."""
    from vitpose_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD
    x = canvas[None].astype(np.float32) / 255.0
    x = (x - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    out = est.apply({}, x)
    outs = list(out) if isinstance(out, (list, tuple)) else [out]
    return [torch.from_numpy(
        np.asarray(o, np.float32).transpose(0, 3, 1, 2).copy())
        for o in outs]


def _ref_pipeline(est, img, test_scale_factor, base_size,
                  flip_index, use_udp=False):
    """Reference forward_test (associative_embedding.py:201) composed from
    reference modules, with the network swapped for the stub."""
    but = ref_bottom_up_transform()
    bue = ref_bottom_up_eval()
    grp = ref_group()
    align_corners = bool(use_udp)
    input_size = np.array([base_size, base_size])
    min_scale = min(test_scale_factor)

    # BottomUpGetImgSize(current_scale=1): img_metas base_size/center/scale
    base_wh, center, scale = but._get_multi_scale_size(
        img, input_size, 1, min_scale, use_udp)
    center = np.asarray(center, np.float32)
    scale = np.asarray(scale, np.float32)

    scale_heatmaps_list, scale_tags_list = [], []
    for s in sorted(test_scale_factor, reverse=True):
        if use_udp:
            resized, _, _ = but._resize_align_multi_scale_udp(
                img, input_size, s, min_scale)
        else:
            resized, _, _ = but._resize_align_multi_scale(
                img, input_size, s, min_scale)

        def split(outs):
            return bue.split_ae_outputs(
                outs, K, [True] * len(outs),
                [o.shape[1] > K for o in outs], range(len(outs)))

        heatmaps, tags = split(_forward(est, resized))
        hms_f, tags_f = split(_forward(est, resized[:, ::-1].copy()))
        hms_f = bue.flip_feature_maps(hms_f, flip_index=flip_index)
        tags_f = bue.flip_feature_maps(tags_f, flip_index=flip_index)

        agg_hm = bue.aggregate_stage_flip(
            heatmaps, hms_f, index=-1, project2image=True,
            size_projected=tuple(base_wh), align_corners=align_corners,
            aggregate_stage='average', aggregate_flip='average')
        agg_tags = bue.aggregate_stage_flip(
            tags, tags_f, index=-1, project2image=True,
            size_projected=tuple(base_wh), align_corners=align_corners,
            aggregate_stage='concat', aggregate_flip='concat')
        if s == 1 or len(test_scale_factor) == 1:
            scale_tags_list.extend(
                agg_tags if isinstance(agg_tags, list) else [agg_tags])
        scale_heatmaps_list.extend(
            agg_hm if isinstance(agg_hm, list) else [agg_hm])

    heatmaps = bue.aggregate_scale(scale_heatmaps_list,
                                   align_corners=align_corners,
                                   aggregate_scale='average')
    tags = bue.aggregate_scale(scale_tags_list,
                               align_corners=align_corners,
                               aggregate_scale='unsqueeze_concat')

    parser = grp.HeatmapParser(dict(
        num_joints=K, max_num_people=30, nms_kernel=5, nms_padding=2,
        detection_threshold=0.1, tag_threshold=1.0, use_detection_val=True,
        ignore_too_much=False, tag_per_joint=True, use_udp=use_udp,
        score_per_joint=False))
    grouped, scores = parser.parse(heatmaps, tags, True, True)
    preds = bue.get_group_preds(
        grouped, center, scale,
        [heatmaps.size(3), heatmaps.size(2)], use_udp=use_udp)
    return preds, [float(sc) for sc in scores]


@pytest.mark.parametrize('scales,use_udp', [
    ((1.0,), False),
    ((2.0, 1.0, 0.5), False),
    ((1.0,), True),
])
def test_bottomup_e2e_matches_reference(scales, use_udp):
    import cv2
    from vitpose_tpu.api.inference import inference_bottom_up_multi_scale

    est = _StubEstimator(use_udp=use_udp)
    img = cv2.cvtColor(cv2.imread(IMG), cv2.COLOR_BGR2RGB)
    info = est.dataset_info

    ref_preds, ref_scores = _ref_pipeline(
        est, img, scales, base_size=128,
        flip_index=list(info.flip_index), use_udp=use_udp)

    got, _ = inference_bottom_up_multi_scale(
        est, {}, img, test_scale_factor=scales, base_size=128,
        use_udp=use_udp, pose_nms_thr=None, with_flip=True)

    assert len(ref_preds) >= 3          # the painted people were found
    assert len(got) == len(ref_preds), (len(got), len(ref_preds))
    # person ORDER is the one legitimate difference: the reference keeps
    # match_by_tag dict order, ours sorts by score — normalize by score
    ref_order = np.argsort(ref_scores)[::-1]
    got_order = np.argsort([g['score'] for g in got])[::-1]
    for ri, gi in zip(ref_order, got_order):
        r = np.asarray(ref_preds[ri])
        g = got[gi]['keypoints']
        np.testing.assert_allclose(g[:, :2], r[:, :2],
                                   rtol=1e-4, atol=5e-3)
        if not use_udp:
            # reference transform_preds quirk (post_transforms.py:190
            # np.ones_like): non-UDP bottom-up per-joint vals are all 1.0;
            # we keep the true heatmap vals instead
            assert (r[:, 2] == 1.0).all()
        else:
            np.testing.assert_allclose(g[:, 2], r[:, 2], atol=1e-4)
        assert abs(got[gi]['score'] - ref_scores[ri]) < 1e-4
    np.testing.assert_allclose(sorted(s['score'] for s in got),
                               sorted(ref_scores), atol=1e-4)

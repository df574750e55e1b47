"""Golden test: bottom-up grouping vs the reference HeatmapParser."""
import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

from vitpose_tpu.ops.group import HeatmapParser

REF = "/root/reference"


def _load_ref_group():
    name = "_ref_group"
    if name in sys.modules:
        return sys.modules[name]
    # munkres stub built on scipy's Hungarian solver
    from scipy.optimize import linear_sum_assignment

    munkres = types.ModuleType("munkres")

    class Munkres:
        def compute(self, cost):
            cost = np.asarray(cost)
            rows, cols = linear_sum_assignment(cost)
            return list(zip(rows.tolist(), cols.tolist()))

    munkres.Munkres = Munkres

    from vitpose_tpu.ops.decode import post_dark_udp as _pdu
    evaluation = types.ModuleType("mmpose.core.evaluation")

    def post_dark_udp(coords, hm, kernel=3):
        import jax.numpy as jnp
        return np.asarray(_pdu(jnp.asarray(coords), jnp.asarray(hm),
                               kernel=kernel))

    evaluation.post_dark_udp = post_dark_udp
    mods = [("munkres", munkres),
            ("mmpose", types.ModuleType("mmpose")),
            ("mmpose.core", types.ModuleType("mmpose.core")),
            ("mmpose.core.evaluation", evaluation)]
    for n, m in mods:
        sys.modules[n] = m
    spec = importlib.util.spec_from_file_location(
        name, f"{REF}/mmpose/core/post_processing/group.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def synth_scene(seed=0, k=17, h=64, w=48, n_people=3, sigma=2.0):
    """Heatmaps + tag maps for a synthetic multi-person scene."""
    rng = np.random.RandomState(seed)
    hm = np.zeros((1, k, h, w), np.float32)
    tags = np.zeros((1, k, h, w, 1), np.float32)
    ys, xs = np.mgrid[0:h, 0:w]
    for p in range(n_people):
        tag_val = float(p * 2.0 + rng.randn() * 0.05)
        cx0 = rng.uniform(8, w - 8)
        cy0 = rng.uniform(8, h - 8)
        for j in range(k):
            if rng.rand() < 0.15:
                continue
            cx = np.clip(cx0 + rng.randn() * 4, 2, w - 3)
            cy = np.clip(cy0 + rng.randn() * 4, 2, h - 3)
            g = np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * sigma ** 2))
            hm[0, j] = np.maximum(hm[0, j], g)
            tags[0, j][g > 0.3] = tag_val
    hm += rng.uniform(0, 0.005, hm.shape).astype(np.float32)
    return hm, tags


@pytest.mark.parametrize("seed", [0, 1])
def test_parse_matches_reference(seed):
    hm, tags = synth_scene(seed)
    cfg = dict(num_joints=17, max_num_people=30, nms_kernel=5, nms_padding=2,
               detection_threshold=0.1, tag_threshold=1.0,
               use_detection_val=True, ignore_too_much=False,
               tag_per_joint=True, use_udp=False, score_per_joint=False)
    refmod = _load_ref_group()
    ref_parser = refmod.HeatmapParser(cfg)
    ref_results, ref_scores = ref_parser.parse(
        torch.from_numpy(hm), torch.from_numpy(tags), adjust=True,
        refine=True)

    ours = HeatmapParser(num_joints=17, max_num_people=30, nms_kernel=5,
                         detection_threshold=0.1, tag_threshold=1.0)
    res, scores = ours.parse(hm, tags, adjust=True, refine=True)

    ref_poses = ref_results[0]
    got_poses = res[0]
    assert len(got_poses) == len(ref_poses), (len(got_poses), len(ref_poses))
    # order may differ; sort by mean x
    def order(ps):
        return np.argsort([p[p[:, 2] > 0, 0].mean() for p in ps])
    ref_sorted = np.asarray(ref_poses)[order(np.asarray(ref_poses))]
    got_sorted = got_poses[order(got_poses)]
    np.testing.assert_allclose(got_sorted, ref_sorted, atol=1e-3)
    np.testing.assert_allclose(sorted(scores),
                               sorted([float(s) for s in ref_scores]),
                               atol=1e-4)

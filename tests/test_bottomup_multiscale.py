"""Bottom-up completeness goldens: AEHigherResolutionHead conversion
parity, multi-scale/flip aggregation vs the reference bottom_up_eval
functions, and an end-to-end multi-scale flip-test inference producing
grouped people on the COCO fixture."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from vitpose_tpu.utils import cnn_ckpt as CK
from vitpose_tpu.models import bottomup as BU

import ref_cnn_loader as L


def test_ae_higher_head_parity():
    torch.manual_seed(20)
    m = L.ref_ae_higher_head()
    net = m.AEHigherResolutionHead(
        in_channels=32, num_joints=17, tag_per_joint=True,
        extra=dict(final_conv_kernel=1), num_deconv_layers=1,
        num_deconv_filters=(32,), num_deconv_kernels=(4,),
        num_basic_blocks=2, cat_output=[True],
        with_ae_loss=[True, False])
    net.eval()
    x = np.random.RandomState(20).randn(2, 32, 16, 12).astype(np.float32)
    with torch.no_grad():
        refs = [t.numpy() for t in net(torch.from_numpy(x))]
    from vitpose_tpu.models.heads_extra import AEHigherResolutionHead
    model = AEHigherResolutionHead(
        num_joints=17, num_deconv_layers=1, deconv_filters=(32,),
        deconv_kernels=(4,), num_basic_blocks=2, cat_output=(True,),
        with_ae_loss=(True, False))
    params, stats = CK.convert_ae_higher_head(
        {k: v.numpy() for k, v in net.state_dict().items()})
    outs = model.apply({'params': params, 'batch_stats': stats},
                       jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    assert len(outs) == len(refs) == 2
    for o, r in zip(outs, refs):
        o = np.asarray(o).transpose(0, 3, 1, 2)
        assert o.shape == r.shape, (o.shape, r.shape)
        np.testing.assert_allclose(o, r, rtol=1e-4, atol=1e-4)


def test_aggregation_golden():
    """split/flip/aggregate_stage_flip/aggregate_scale vs the reference
    torch implementations."""
    be = L.ref_bottom_up_eval()
    rng = np.random.RandomState(21)
    outs = [rng.randn(1, 34, 16, 12).astype(np.float32),
            rng.randn(1, 17, 32, 24).astype(np.float32)]
    flip_index = list(np.random.RandomState(1).permutation(17))

    # split
    hm_r, tg_r = be.split_ae_outputs(
        [torch.from_numpy(o) for o in outs], 17,
        with_heatmaps=[True, True], with_ae=[True, False],
        select_output_index=[0, 1])
    hm_o, tg_o = BU.split_ae_outputs(
        [jnp.asarray(o) for o in outs], 17,
        with_heatmaps=[True, True], with_ae=[True, False],
        select_output_index=[0, 1])
    assert len(hm_o) == len(hm_r) and len(tg_o) == len(tg_r)
    for a, b in zip(hm_o, hm_r):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), rtol=1e-6)

    # flip
    ff_r = be.flip_feature_maps([torch.from_numpy(outs[1])],
                                flip_index=flip_index)
    ff_o = BU.flip_feature_maps([jnp.asarray(outs[1])],
                                flip_index=flip_index)
    np.testing.assert_allclose(np.asarray(ff_o[0]), ff_r[0].numpy(),
                               rtol=1e-6)

    # aggregate_stage_flip (project to base size, average flip)
    for align in (False, True):
        agg_r = be.aggregate_stage_flip(
            [torch.from_numpy(o[:, :17]) for o in outs],
            [torch.from_numpy(o[:, :17]) for o in outs],
            index=-1, project2image=True, size_projected=(48, 64),
            align_corners=align, aggregate_stage='average',
            aggregate_flip='average')
        agg_o = BU.aggregate_stage_flip(
            [jnp.asarray(o[:, :17]) for o in outs],
            [jnp.asarray(o[:, :17]) for o in outs],
            index=-1, project2image=True, size_projected=(48, 64),
            align_corners=align, aggregate_stage='average',
            aggregate_flip='average')
        assert len(agg_o) == len(agg_r)
        np.testing.assert_allclose(np.asarray(agg_o[0]), agg_r[0].numpy(),
                                   rtol=1e-4, atol=1e-5)

    # aggregate_scale: average and unsqueeze_concat
    maps = [rng.randn(1, 17, 64, 48).astype(np.float32),
            rng.randn(1, 17, 32, 24).astype(np.float32)]
    for mode in ('average', 'unsqueeze_concat'):
        r = be.aggregate_scale([torch.from_numpy(m) for m in maps],
                               align_corners=False, aggregate_scale=mode)
        o = BU.aggregate_scale([jnp.asarray(m) for m in maps],
                               align_corners=False,
                               aggregate_scale_mode=mode)
        np.testing.assert_allclose(np.asarray(o), r.numpy(), rtol=1e-4,
                                   atol=1e-5)


def test_multiscale_flip_inference_groups_people():
    """End-to-end: HigherHRNet-style two-output model, two test scales with
    flip averaging, grouped people out of the parser."""
    import cv2
    from vitpose_tpu.models.heads_extra import AEHigherResolutionHead
    from vitpose_tpu.models.hrnet import HRNet, HRNetConfig
    from vitpose_tpu.ops.group import HeatmapParser

    bb = HRNet(HRNetConfig(width=16, stage_modules=(1, 1, 1)))
    head = AEHigherResolutionHead(num_joints=17, num_deconv_layers=1,
                                  deconv_filters=(16,), deconv_kernels=(4,),
                                  num_basic_blocks=1, cat_output=(True,),
                                  with_ae_loss=(True, False))
    rng = jax.random.PRNGKey(0)
    img = cv2.imread(
        '/root/reference/tests/data/coco/000000000785.jpg')[..., ::-1]
    base = cv2.resize(img, (128, 128)).astype(np.float32) / 255.0

    bb_vars = bb.init(rng, jnp.zeros((1, 128, 128, 3)))
    feat = bb.apply(bb_vars, jnp.zeros((1, 128, 128, 3)))
    hd_vars = head.init(rng, feat)

    def fwd(x):
        outs = head.apply(hd_vars, bb.apply(bb_vars, x))
        return [o.transpose(0, 3, 1, 2) for o in outs]

    flip_index = np.array([0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14,
                           13, 16, 15])
    per_scale = []
    tags_list = []
    for si, s in enumerate((1.0, 0.5)):
        size = (int(128 * s), int(128 * s))
        x = jnp.asarray(cv2.resize(base, size)[None])
        outs = fwd(x)
        outs_f = fwd(x[:, :, ::-1])
        hms, tags = BU.split_ae_outputs(outs, 17, [True, True],
                                        [True, False], [0, 1])
        hms_f, tags_f = BU.split_ae_outputs(outs_f, 17, [True, True],
                                            [True, False], [0, 1])
        hms_f = BU.flip_feature_maps(hms_f, flip_index=list(flip_index))
        tags_f = BU.flip_feature_maps(tags_f, flip_index=list(flip_index))
        agg_hm = BU.aggregate_stage_flip(
            hms, hms_f, index=-1, project2image=True,
            size_projected=(128, 128), aggregate_stage='average',
            aggregate_flip='average')
        per_scale.extend(agg_hm)
        if s == 1.0:
            agg_tag = BU.aggregate_stage_flip(
                tags, tags_f, index=-1, project2image=True,
                size_projected=(128, 128), aggregate_stage='concat',
                aggregate_flip='concat')
            tags_list.extend(agg_tag)
    heatmaps = BU.aggregate_scale(per_scale)
    tags = BU.aggregate_scale(tags_list,
                              aggregate_scale_mode='unsqueeze_concat')
    assert heatmaps.shape == (1, 17, 128, 128)
    assert tags.shape[:4] == (1, 17, 128, 128) and tags.shape[4] == 2
    parser = HeatmapParser(num_joints=17, max_num_people=5,
                           detection_threshold=-10.0)
    grouped, scores = parser.parse(np.asarray(heatmaps), np.asarray(tags),
                                   adjust=True, refine=True)
    assert isinstance(grouped, list) and len(grouped) == 1
    assert all(np.isfinite(s) for s in scores)


def test_resize_align_golden():
    """get_multi_scale_size / resize_align_multi_scale (plain + UDP) vs the
    reference bottom_up_transform functions."""
    import sys, types
    import cv2
    from ref_loader import ref_post_transforms, _load
    from vitpose_tpu.data.bottomup import (get_multi_scale_size,
                                           resize_align_multi_scale)
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
    mt = _load(
        '/root/reference/mmpose/datasets/pipelines/bottom_up_transform.py',
        'mmpose.datasets.pipelines.bottom_up_transform',
        pre_modules=[('mmcv', types.ModuleType('mmcv')),
                     ('mmpose', types.ModuleType('mmpose')),
                     ('mmpose.core', types.ModuleType('mmpose.core')),
                     ('mmpose.core.post_processing', fake_pp),
                     ('mmpose.datasets', types.ModuleType('mmpose.datasets')),
                     ('mmpose.datasets.builder', fb),
                     ('mmpose.datasets.pipelines', pipelines_pkg),
                     ('mmpose.datasets.pipelines.shared_transform', shared)])
    img = cv2.imread('/root/reference/tests/data/coco/000000000785.jpg')
    for cur, use_udp in ((1.0, False), (2.0, False), (1.0, True),
                         (0.5, True)):
        ref_sz, ref_c, ref_s = mt._get_multi_scale_size(
            img, np.array([512, 512]), cur, 0.5, use_udp)
        sz, c, s = get_multi_scale_size(img, (512, 512), cur, 0.5, use_udp)
        assert tuple(sz) == tuple(ref_sz)
        np.testing.assert_allclose(c, np.asarray(ref_c, np.float32),
                                   rtol=1e-6)
        np.testing.assert_allclose(s, ref_s, rtol=1e-6)
        if use_udp:
            ref_img, ref_c2, ref_s2 = mt._resize_align_multi_scale_udp(
                img, np.array([512, 512]), cur, 0.5)
        else:
            ref_img, ref_c2, ref_s2 = mt._resize_align_multi_scale(
                img, np.array([512, 512]), cur, 0.5)
        got, c2, s2 = resize_align_multi_scale(img, (512, 512), cur, 0.5,
                                               use_udp)
        assert got.shape == ref_img.shape
        diff = np.abs(got.astype(np.int32) - ref_img.astype(np.int32))
        assert diff.max() <= 1, diff.max()      # cv2 rounding only
        np.testing.assert_allclose(np.asarray(c2, np.float32),
                                   np.asarray(ref_c2, np.float32),
                                   rtol=1e-6)
        np.testing.assert_allclose(s2, ref_s2, rtol=1e-6)


def test_higher_hrnet_multires_inference_paths():
    """AEHigherResolutionHead returns a LIST of multi-resolution maps;
    both inference helpers must aggregate it (reference HigherHRNet
    single-scale: upsample+average heatmaps, tags from output 0)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vitpose_tpu.utils.config import load_config
    from vitpose_tpu.train.loop import build_model_from_cfg
    from vitpose_tpu.api.inference import inference_bottom_up_multi_scale

    cfg = load_config('vitpose_tpu/configs/coco/'
                      'higherhrnet_w32_coco_512x512.py')
    cfg['model']['backbone_overrides'] = dict(width=8,
                                              stage_modules=(1, 1, 1),
                                              stage_blocks=1)
    cfg['model']['head_overrides'] = dict(num_basic_blocks=1,
                                          deconv_filters=(8,),
                                          deconv_kernels=(4,),
                                          cat_output=(True,),
                                          with_ae_loss=(True, False),
                                          final_kernel=1,
                                          tag_per_joint=True)
    est = build_model_from_cfg(cfg['model'])
    rng = jax.random.PRNGKey(0)
    variables = est.init(rng, jnp.zeros((1, 128, 128, 3)))
    out = est.apply(variables, jnp.zeros((1, 128, 128, 3)))
    assert isinstance(out, list) and len(out) == 2

    # single-scale jit path (estimator.infer)
    fi = est.dataset_info.flip_index
    hm, tags = est.infer(variables, jnp.zeros((2, 128, 128, 3)), fi)
    assert hm.shape[:2] == (2, 17)
    assert tags.shape[:2] == (2, 17) and tags.shape[-1] == 2
    # aggregated at the HIGHEST output resolution
    assert hm.shape[2] == out[1].shape[1]

    # multi-scale API path
    img = (np.random.RandomState(0).rand(160, 120, 3) * 255).astype(
        np.uint8)
    pose_results, _ = inference_bottom_up_multi_scale(
        est, variables, img, test_scale_factor=(1.0,), base_size=128)
    for p in pose_results:
        assert np.isfinite(p['keypoints']).all()


def test_hourglass_ae_multiscale_inference_selects_last_stage():
    """Multi-stage (Hourglass-AE) estimators go through
    inference_bottom_up_multi_scale with the last-stage selection and the
    NHWC normalization applied in BottomUpEstimator.apply (regression
    guard for the NCHW layout finding)."""
    import numpy as np
    from vitpose_tpu.models.bottomup import BottomUpEstimator
    from vitpose_tpu.models.lightweight import HourglassAE
    from vitpose_tpu.models.heads_extra import AEMultiStageHead
    from vitpose_tpu.data.dataset_info import DatasetInfo
    from vitpose_tpu.api.inference import inference_bottom_up_multi_scale

    bb = HourglassAE(downsample_times=2, num_stacks=2, out_channels=34,
                     stage_channels=(16, 24, 32), feat_channels=16)
    head = AEMultiStageHead(out_channels=34, num_stages=2,
                            num_deconv_layers=0, deconv_filters=(),
                            deconv_kernels=(), final_kernel=0)
    est = BottomUpEstimator(bb, num_joints=17, head=head,
                            dataset_info=DatasetInfo.load('coco'))
    rng = jax.random.PRNGKey(1)
    variables = est.init(rng, jnp.zeros((1, 64, 64, 3)))
    out = est.apply(variables, jnp.zeros((1, 64, 64, 3)))
    # estimator-wide NHWC convention even for the NCHW-native head
    assert isinstance(out, list) and out[0].shape == (1, 16, 16, 34)

    img = (np.random.RandomState(3).rand(80, 70, 3) * 255).astype(np.uint8)
    pose_results, scores = inference_bottom_up_multi_scale(
        est, variables, img, test_scale_factor=(1.0,), base_size=64)
    for p in pose_results:
        assert np.isfinite(p['keypoints']).all()

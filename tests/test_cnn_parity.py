"""Conversion-parity goldens for the CNN backbone zoo: random-init reference
torch backbones -> cnn_ckpt converters -> our flax models must match outputs
(the test pattern of test_model_parity.py, extended to the CNN families)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from vitpose_tpu.utils import cnn_ckpt as CK

import ref_cnn_loader as L


def _sd(net):
    return {k: v.detach().numpy() for k, v in net.state_dict().items()}


def _run_flax(model, params, stats, x_nchw):
    var = {'params': params}
    if stats:
        var['batch_stats'] = stats
    out = model.apply(var, jnp.asarray(x_nchw.transpose(0, 2, 3, 1)),
                      train=False)
    return np.asarray(out).transpose(0, 3, 1, 2)


def _assert_close(ours, ref, tol=1e-4):
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    np.testing.assert_allclose(ours, ref, rtol=tol, atol=tol)


def test_resnext_parity():
    torch.manual_seed(0)
    net = L.ref_resnext().ResNeXt(depth=50, groups=32, width_per_group=4)
    net.eval()
    x = np.random.RandomState(0).randn(2, 3, 64, 48).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x))
        ref = (ref[0] if isinstance(ref, (list, tuple)) else ref).numpy()
    from vitpose_tpu.models.resnext import ResNeXt
    params, stats = CK.convert_resnext(_sd(net))
    _assert_close(_run_flax(ResNeXt(depth=50), params, stats, x), ref)


def test_seresnext_parity():
    torch.manual_seed(1)
    net = L.ref_seresnext().SEResNeXt(depth=50)
    net.eval()
    x = np.random.RandomState(1).randn(2, 3, 64, 48).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x))
        ref = (ref[0] if isinstance(ref, (list, tuple)) else ref).numpy()
    from vitpose_tpu.models.resnext import SEResNeXt
    params, stats = CK.convert_resnext(_sd(net))
    _assert_close(_run_flax(SEResNeXt(depth=50), params, stats, x), ref)


def test_seresnet_parity():
    torch.manual_seed(2)
    net = L.ref_seresnet().SEResNet(depth=50)
    net.eval()
    x = np.random.RandomState(2).randn(2, 3, 64, 48).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x))
        ref = (ref[0] if isinstance(ref, (list, tuple)) else ref).numpy()
    from vitpose_tpu.models.classic_cnns import SEResNet
    params, stats = CK.convert_seresnet(_sd(net))
    _assert_close(_run_flax(SEResNet(depth=50), params, stats, x), ref)


def test_resnet_v1d_parity():
    """ResNetV1d (deep stem + avg_down) conversion golden — odd input size
    so the ceil-mode AvgPool in the shortcut is actually exercised."""
    torch.manual_seed(7)
    net = L.ref_resnet().ResNetV1d(depth=50)
    net.eval()
    x = np.random.RandomState(7).randn(2, 3, 60, 44).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x))
        ref = (ref[0] if isinstance(ref, (list, tuple)) else ref).numpy()
    from vitpose_tpu.models.resnet import ResNetV1d
    params, stats = CK.BACKBONE_CONVERTERS['resnet_v1d'](_sd(net))
    _assert_close(_run_flax(ResNetV1d(depth=50), params, stats, x), ref)


def test_hourglass_parity():
    torch.manual_seed(4)
    net = L.ref_hourglass().HourglassNet(
        downsample_times=3, num_stacks=2, stage_channels=(256, 64, 96, 96),
        stage_blocks=(1, 1, 1, 2), feat_channel=32)
    net.eval()
    x = np.random.RandomState(4).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        refs = [t.numpy() for t in net(torch.from_numpy(x))]
    from vitpose_tpu.models.lightweight import Hourglass
    model = Hourglass(downsample_times=3, num_stacks=2,
                      stage_channels=(256, 64, 96, 96),
                      stage_blocks=(1, 1, 1, 2), feat_channel=32)
    params, stats = CK.convert_hourglass(_sd(net), downsample_times=3)
    var = {'params': params, 'batch_stats': stats}
    outs = model.apply(var, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       train=False)
    assert len(outs) == len(refs)
    for o, r in zip(outs, refs):
        _assert_close(np.asarray(o).transpose(0, 3, 1, 2), r)


def test_hourglass_ae_parity():
    torch.manual_seed(5)
    net = L.ref_hourglass_ae().HourglassAENet(
        downsample_times=3, num_stacks=2, out_channels=10,
        stage_channels=(32, 48, 64, 64), feat_channels=32)
    net.eval()
    x = np.random.RandomState(5).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        refs = [t.numpy() for t in net(torch.from_numpy(x))]
    from vitpose_tpu.models.lightweight import HourglassAE
    model = HourglassAE(downsample_times=3, num_stacks=2, out_channels=10,
                        stage_channels=(32, 48, 64, 64), feat_channels=32)
    params, stats = CK.convert_hourglass_ae(_sd(net), downsample_times=3)
    var = {'params': params, 'batch_stats': stats}
    outs = model.apply(var, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       train=False)
    assert len(outs) == len(refs)
    for o, r in zip(outs, refs):
        _assert_close(np.asarray(o).transpose(0, 3, 1, 2), r)


def test_hrnet_parity():
    torch.manual_seed(3)
    extra = dict(
        stage1=dict(num_modules=1, num_branches=1, block='BOTTLENECK',
                    num_blocks=(4,), num_channels=(64,)),
        stage2=dict(num_modules=1, num_branches=2, block='BASIC',
                    num_blocks=(4, 4), num_channels=(16, 32)),
        stage3=dict(num_modules=1, num_branches=3, block='BASIC',
                    num_blocks=(4, 4, 4), num_channels=(16, 32, 64)),
        stage4=dict(num_modules=1, num_branches=4, block='BASIC',
                    num_blocks=(4, 4, 4, 4), num_channels=(16, 32, 64, 128)))
    net = L.ref_hrnet().HRNet(extra, in_channels=3)
    net.eval()
    x = np.random.RandomState(3).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x))
        ref = (ref[0] if isinstance(ref, (list, tuple)) else ref).numpy()
    from vitpose_tpu.models.hrnet import HRNet, HRNetConfig
    cfg = HRNetConfig(width=16, stage_modules=(1, 1, 1), stage_blocks=4)
    params, stats = CK.convert_hrnet(_sd(net))
    _assert_close(_run_flax(HRNet(cfg), params, stats, x), ref)


def test_hrnetv2_parity():
    """HRNetV2 = HRNet with stage4 multiscale_output + the head's
    resize_concat transform (reference hrnetv2_w18_*.py configs: backbone
    multiscale_output=True, head input_transform='resize_concat' with
    bilinear align_corners=False upsample). Our multiscale_concat flag
    folds the concat into the backbone; converted torch weights must
    reproduce the concatenated feature map."""
    torch.manual_seed(9)
    extra = dict(
        stage1=dict(num_modules=1, num_branches=1, block='BOTTLENECK',
                    num_blocks=(4,), num_channels=(64,)),
        stage2=dict(num_modules=1, num_branches=2, block='BASIC',
                    num_blocks=(4, 4), num_channels=(16, 32)),
        stage3=dict(num_modules=1, num_branches=3, block='BASIC',
                    num_blocks=(4, 4, 4), num_channels=(16, 32, 64)),
        stage4=dict(num_modules=1, num_branches=4, block='BASIC',
                    num_blocks=(4, 4, 4, 4), num_channels=(16, 32, 64, 128),
                    multiscale_output=True))
    net = L.ref_hrnet().HRNet(extra, in_channels=3)
    net.eval()
    x = np.random.RandomState(9).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        outs = net(torch.from_numpy(x))
        th, tw = outs[0].shape[2:]
        ups = [outs[0]] + [
            torch.nn.functional.interpolate(o, size=(th, tw),
                                            mode='bilinear',
                                            align_corners=False)
            for o in outs[1:]]
        ref = torch.cat(ups, dim=1).numpy()
    from vitpose_tpu.models.hrnet import HRNet, HRNetConfig
    cfg = HRNetConfig(width=16, stage_modules=(1, 1, 1), stage_blocks=4,
                      multiscale_concat=True)
    params, stats = CK.convert_hrnet(_sd(net))
    _assert_close(_run_flax(HRNet(cfg), params, stats, x), ref)


def test_scnet_parity():
    torch.manual_seed(6)
    net = L.ref_scnet().SCNet(depth=50)
    net.eval()
    x = np.random.RandomState(6).randn(1, 3, 128, 128).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x))
        ref = (ref[0] if isinstance(ref, (list, tuple)) else ref).numpy()
    from vitpose_tpu.models.more_cnns import SCNet
    params, stats = CK.convert_scnet(_sd(net))
    _assert_close(_run_flax(SCNet(depth=50), params, stats, x), ref)


def test_mspn_parity():
    torch.manual_seed(7)
    net = L.ref_mspn().MSPN(unit_channels=32, num_stages=2, num_units=4,
                            num_blocks=[1, 1, 1, 1])
    net.eval()
    x = np.random.RandomState(7).randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        refs = net(torch.from_numpy(x))
    from vitpose_tpu.models.multistage_nets import MSPN
    model = MSPN(num_stages=2, num_units=4, num_blocks=(1, 1, 1, 1),
                 unit_channels=32)
    params, stats = CK.convert_mspn(_sd(net))
    outs = model.apply({'params': params, 'batch_stats': stats},
                       jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    assert len(outs) == len(refs)
    for stage_o, stage_r in zip(outs, refs):
        assert len(stage_o) == len(stage_r)
        for o, r in zip(stage_o, stage_r):
            _assert_close(np.asarray(o).transpose(0, 3, 1, 2), r.numpy())


def test_rsn_parity():
    torch.manual_seed(8)
    net = L.ref_rsn().RSN(unit_channels=32, num_stages=2, num_units=4,
                          num_blocks=[1, 1, 1, 1], num_steps=2)
    net.eval()
    x = np.random.RandomState(8).randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        refs = net(torch.from_numpy(x))
    from vitpose_tpu.models.multistage_nets import RSN
    model = RSN(num_stages=2, unit_channels=32, num_units=4,
                num_blocks=(1, 1, 1, 1), num_steps=2)
    params, stats = CK.convert_mspn(_sd(net))
    outs = model.apply({'params': params, 'batch_stats': stats},
                       jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    assert len(outs) == len(refs)
    for stage_o, stage_r in zip(outs, refs):
        for o, r in zip(stage_o, stage_r):
            _assert_close(np.asarray(o).transpose(0, 3, 1, 2), r.numpy())


def test_vipnas_mbv3_parity():
    torch.manual_seed(9)
    net = L.ref_vipnas_mbv3().ViPNAS_MobileNetV3()
    net.eval()
    x = np.random.RandomState(9).randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x))
        ref = (ref[0] if isinstance(ref, (list, tuple)) else ref).numpy()
    from vitpose_tpu.models.more_cnns import ViPNASMobileNetV3
    params, stats = CK.convert_vipnas_mbv3(_sd(net))
    _assert_close(_run_flax(ViPNASMobileNetV3(), params, stats, x), ref)


def test_vipnas_resnet_parity():
    torch.manual_seed(10)
    net = L.ref_vipnas_resnet().ViPNAS_ResNet(depth=50)
    net.eval()
    x = np.random.RandomState(10).randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x))
        ref = (ref[0] if isinstance(ref, (list, tuple)) else ref).numpy()
    from vitpose_tpu.models.more_cnns import ViPNASResNet
    params, stats = CK.convert_vipnas_resnet(_sd(net))
    _assert_close(_run_flax(ViPNASResNet(), params, stats, x), ref)


def test_hrformer_parity():
    torch.manual_seed(11)
    extra = dict(
        drop_path_rate=0.0, with_rpe=True,
        stage1=dict(num_modules=1, num_branches=1, block='BOTTLENECK',
                    num_blocks=(2,), num_channels=(64,)),
        stage2=dict(num_modules=1, num_branches=2, block='HRFORMERBLOCK',
                    window_sizes=(7, 7), num_heads=(1, 2),
                    mlp_ratios=(4, 4), num_blocks=(2, 2),
                    num_channels=(32, 64)),
        stage3=dict(num_modules=1, num_branches=3, block='HRFORMERBLOCK',
                    window_sizes=(7, 7, 7), num_heads=(1, 2, 4),
                    mlp_ratios=(4, 4, 4), num_blocks=(2, 2, 2),
                    num_channels=(32, 64, 128)),
        stage4=dict(num_modules=1, num_branches=4, block='HRFORMERBLOCK',
                    window_sizes=(7, 7, 7, 7), num_heads=(1, 2, 4, 8),
                    mlp_ratios=(4, 4, 4, 4), num_blocks=(2, 2, 2, 2),
                    num_channels=(32, 64, 128, 256)))
    net = L.ref_hrformer().HRFormer(extra, in_channels=3)
    # the rel-pos tables are zero-init in the reference constructor; give
    # them real values so the bias path is actually tested
    with torch.no_grad():
        for n, p in net.named_parameters():
            if 'relative_position_bias_table' in n:
                p.normal_(0, 0.5)
    net.eval()
    x = np.random.RandomState(11).randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x))
        ref = (ref[0] if isinstance(ref, (list, tuple)) else ref).numpy()
    from vitpose_tpu.models.hrformer import HRFormer
    model = HRFormer(width=32, stage_modules=(1, 1, 1),
                     blocks_per_module=2)
    params, stats = CK.convert_hrformer(_sd(net))
    _assert_close(_run_flax(model, params, stats, x), ref, tol=2e-4)


def test_litehrnet_parity():
    torch.manual_seed(12)
    extra = dict(
        stem=dict(stem_channels=32, out_channels=32, expand_ratio=1),
        num_stages=3,
        stages_spec=dict(
            num_modules=(1, 1, 1), num_branches=(2, 3, 4),
            num_blocks=(2, 2, 2), module_type=('LITE', 'LITE', 'LITE'),
            with_fuse=(True, True, True), reduce_ratios=(8, 8, 8),
            num_channels=((40, 80), (40, 80, 160), (40, 80, 160, 320))),
        with_head=False)
    net = L.ref_litehrnet().LiteHRNet(extra, in_channels=3)
    net.eval()
    x = np.random.RandomState(12).randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x))
        ref = (ref[0] if isinstance(ref, (list, tuple)) else ref).numpy()
    from vitpose_tpu.models.multistage_nets import LiteHRNet
    model = LiteHRNet(num_modules=(1, 1, 1))
    params, stats = CK.convert_litehrnet(_sd(net))
    _assert_close(_run_flax(model, params, stats, x), ref)


def test_tcn_parity():
    torch.manual_seed(13)
    net = L.ref_tcn().TCN(in_channels=34, stem_channels=64, num_blocks=2,
                          kernel_sizes=(3, 3, 3), dropout=0.0)
    net.eval()
    x = np.random.RandomState(13).randn(2, 34, 27).astype(np.float32)
    with torch.no_grad():
        refs = [t.numpy() for t in net(torch.from_numpy(x))]
    from vitpose_tpu.models.pose3d import TCN
    model = TCN(stem_channels=64, kernel_sizes=(3, 3, 3), dropout=0.0)
    params, stats = CK.convert_tcn(_sd(net))
    out = model.apply({'params': params, 'batch_stats': stats},
                      jnp.asarray(x.transpose(0, 2, 1)), train=False)
    # our TCN returns the final block output [N, T', C]
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1),
                               refs[-1], rtol=1e-4, atol=1e-4)


def test_mobilenet_v2_parity():
    torch.manual_seed(14)
    import ref_cnn_loader as RL
    RL._install_stubs()
    RL._load_backbone_utils()
    mod = RL._load_as('mmpose.models.backbones.mobilenet_v2',
                      'mmpose/models/backbones/mobilenet_v2.py')
    net = mod.MobileNetV2(widen_factor=1.0)
    net.eval()
    x = np.random.RandomState(14).randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x))
        ref = (ref[0] if isinstance(ref, (list, tuple)) else ref).numpy()
    from vitpose_tpu.models.lightweight import MobileNetV2
    params, stats = CK.convert_mobilenet_v2(_sd(net))
    _assert_close(_run_flax(MobileNetV2(), params, stats, x), ref)


def test_shufflenet_v2_parity():
    torch.manual_seed(15)
    import ref_cnn_loader as RL
    RL._install_stubs()
    RL._load_backbone_utils()
    mod = RL._load_as('mmpose.models.backbones.shufflenet_v2',
                      'mmpose/models/backbones/shufflenet_v2.py')
    net = mod.ShuffleNetV2(widen_factor=1.0, out_indices=(3,))
    net.eval()
    x = np.random.RandomState(15).randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x))
        ref = (ref[0] if isinstance(ref, (list, tuple)) else ref).numpy()
    from vitpose_tpu.models.lightweight import ShuffleNetV2
    params, stats = CK.convert_shufflenet_v2(_sd(net))
    _assert_close(_run_flax(ShuffleNetV2(), params, stats, x), ref)


def test_cpm_parity():
    torch.manual_seed(16)
    import ref_cnn_loader as RL
    RL._install_stubs()
    RL._load_backbone_utils()
    mod = RL._load_as('mmpose.models.backbones.cpm',
                      'mmpose/models/backbones/cpm.py')
    net = mod.CPM(in_channels=3, out_channels=17, num_stages=3)
    net.eval()
    x = np.random.RandomState(16).randn(1, 3, 96, 96).astype(np.float32)
    with torch.no_grad():
        refs = [t.numpy() for t in net(torch.from_numpy(x))]
    from vitpose_tpu.models.classic_cnns import CPM
    model = CPM(out_channels=17, num_stages=3)
    params, stats = CK.convert_cpm(_sd(net))
    outs = model.apply({'params': params, 'batch_stats': stats},
                       jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    assert len(outs) == len(refs) == 3
    for o, r in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(o), r, rtol=1e-4, atol=1e-4)


def test_generic_topdown_full_checkpoint_conversion():
    """User path for the CNN zoo: a reference TopDown .pth state dict
    (torch HRNet backbone + TopdownHeatmapSimpleHead) converted by
    convert_generic_topdown_checkpoint must reproduce the full-model
    heatmaps through GenericTopDown (the tools/test.py CONFIG ckpt.pth
    route for non-ViT configs)."""
    import sys
    sys.path.insert(0, 'tests')
    import ref_loader as RL
    from vitpose_tpu.utils.cnn_ckpt import (
        convert_generic_topdown_checkpoint)
    from vitpose_tpu.train.loop import build_model_from_cfg

    torch.manual_seed(11)
    extra = dict(
        stage1=dict(num_modules=1, num_branches=1, block='BOTTLENECK',
                    num_blocks=(4,), num_channels=(64,)),
        stage2=dict(num_modules=1, num_branches=2, block='BASIC',
                    num_blocks=(4, 4), num_channels=(16, 32)),
        stage3=dict(num_modules=1, num_branches=3, block='BASIC',
                    num_blocks=(4, 4, 4), num_channels=(16, 32, 64)),
        stage4=dict(num_modules=1, num_branches=4, block='BASIC',
                    num_blocks=(4, 4, 4, 4), num_channels=(16, 32, 64, 128)))
    bb = L.ref_hrnet().HRNet(extra, in_channels=3)
    head = RL.ref_simple_head().TopdownHeatmapSimpleHead(
        in_channels=16, out_channels=8, num_deconv_layers=0,
        extra=dict(final_conv_kernel=1, num_conv_layers=1,
                   num_conv_kernels=(1,)),
        loss_keypoint=None)
    bb.eval(), head.eval()
    x = np.random.RandomState(11).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        feat = bb(torch.from_numpy(x))
        feat = feat[0] if isinstance(feat, (list, tuple)) else feat
        ref = head(feat).numpy()

    sd = {f'backbone.{k}': v.detach().numpy()
          for k, v in bb.state_dict().items()}
    sd.update({f'keypoint_head.{k}': v.detach().numpy()
               for k, v in head.state_dict().items()})
    model = build_model_from_cfg(dict(
        backbone_type='hrnet',
        backbone_overrides=dict(width=16, stage_modules=(1, 1, 1)),
        img_size=(64, 64), out_channels=8, head='heatmap',
        deconv_filters=(), deconv_kernels=(), head_extra_convs=(1,),
        final_kernel=1))
    variables = convert_generic_topdown_checkpoint(sd, 'hrnet')
    out = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      train=False)
    _assert_close(np.asarray(out), ref, tol=5e-4)


def test_vipnas_head_conversion_parity():
    """ViPNASHeatmapSimpleHead grouped deconvs -> ViPNASHead params."""
    import ref_cnn_loader as RL2
    from vitpose_tpu.utils.cnn_ckpt import convert_vipnas_head
    from vitpose_tpu.models.heads_extra import ViPNASHead

    torch.manual_seed(13)
    head = RL2.ref_vipnas_head().ViPNASHeatmapSimpleHead(
        in_channels=32, out_channels=8, num_deconv_layers=2,
        num_deconv_filters=(16, 16), num_deconv_kernels=(4, 4),
        num_deconv_groups=(4, 4), loss_keypoint=None)
    head.eval()
    x = np.random.RandomState(13).randn(2, 32, 8, 6).astype(np.float32)
    with torch.no_grad():
        ref = head(torch.from_numpy(x)).numpy()
    sd = {f'keypoint_head.{k}': v.detach().numpy()
          for k, v in head.state_dict().items()}
    params, stats = convert_vipnas_head(sd)
    model = ViPNASHead(8, deconv_filters=(16, 16), deconv_groups=(4, 4))
    out = model.apply({'params': params, 'batch_stats': stats},
                      jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    _assert_close(np.asarray(out).transpose(0, 3, 1, 2), ref, tol=5e-4)


def test_hourglass_full_checkpoint_conversion():
    """Hourglass + TopdownHeatmapMultiStageHead .pth -> the multistage
    generic estimator (tools/test.py route for hourglass configs)."""
    import ref_cnn_loader as RL2
    from vitpose_tpu.utils.cnn_ckpt import (
        convert_generic_topdown_checkpoint)
    from vitpose_tpu.train.loop import build_model_from_cfg

    torch.manual_seed(14)
    bb = L.ref_hourglass().HourglassNet(
        downsample_times=3, num_stacks=1, stage_channels=(256, 64, 96, 96),
        stage_blocks=(1, 1, 1, 2), feat_channel=32)
    head = RL2.ref_multistage_head().TopdownHeatmapMultiStageHead(
        in_channels=32, out_channels=8, num_stages=1,
        num_deconv_layers=0, extra=dict(final_conv_kernel=1),
        loss_keypoint=None)
    bb.eval(), head.eval()
    x = np.random.RandomState(14).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        feats = bb(torch.from_numpy(x))
        ref = head(feats)[-1].numpy()

    sd = {}
    sd.update({f'backbone.{k}': v.detach().numpy()
               for k, v in bb.state_dict().items()})
    sd.update({f'keypoint_head.{k}': v.detach().numpy()
               for k, v in head.state_dict().items()})
    model = build_model_from_cfg(dict(
        backbone_type='hourglass',
        backbone_overrides=dict(downsample_times=3, num_stacks=1,
                                stage_channels=(256, 64, 96, 96),
                                stage_blocks=(1, 1, 1, 2),
                                feat_channel=32),
        img_size=(64, 64), out_channels=8, head='multistage',
        num_stages=1, deconv_filters=(), deconv_kernels=(),
        final_kernel=1))
    variables = convert_generic_topdown_checkpoint(sd, 'hourglass')
    out = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      train=False)
    _assert_close(np.asarray(out), ref, tol=5e-4)


def test_mspn_msmu_full_checkpoint_conversion():
    """MSPN + TopdownHeatmapMSMUHead .pth -> the msmu generic estimator
    (tools/test.py route for MSPN/RSN configs). Verifies the faithful
    PredictHeatmap head (1x1 ConvModule + 3x3 ConvModule + align-corners
    resize) converts and matches the reference output."""
    import ref_cnn_loader as RL2
    from vitpose_tpu.utils.cnn_ckpt import (
        convert_generic_topdown_checkpoint)
    from vitpose_tpu.train.loop import build_model_from_cfg

    torch.manual_seed(15)
    bb = L.ref_mspn().MSPN(unit_channels=32, num_stages=2, num_units=4,
                           num_blocks=[1, 1, 1, 1])
    head = RL2.ref_multistage_head().TopdownHeatmapMSMUHead(
        out_shape=(16, 16), unit_channels=32, out_channels=8,
        num_stages=2, num_units=4, loss_keypoint=None)
    bb.eval(), head.eval()
    x = np.random.RandomState(15).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        feats = bb(torch.from_numpy(x))
        ref = head(feats)[-1].numpy()      # last unit = inference output

    sd = {}
    sd.update({f'backbone.{k}': v.detach().numpy()
               for k, v in bb.state_dict().items()})
    sd.update({f'keypoint_head.{k}': v.detach().numpy()
               for k, v in head.state_dict().items()})
    model = build_model_from_cfg(dict(
        backbone_type='mspn',
        backbone_overrides=dict(num_stages=2, num_units=4,
                                num_blocks=(1, 1, 1, 1),
                                unit_channels=32),
        img_size=(64, 64), out_channels=8, head='msmu',
        num_stages=2, num_units=4))
    variables = convert_generic_topdown_checkpoint(sd, 'mspn')
    out = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      train=False)
    _assert_close(np.asarray(out), ref, tol=5e-4)


def test_cpm_full_checkpoint_conversion():
    """CPM .pth: the reference pairs the CPM backbone with an IDENTITY
    head (cpm_coco config final_conv_kernel=0, num_deconv_layers=0), so
    full-model conversion is the backbone conversion alone."""
    from vitpose_tpu.utils.cnn_ckpt import (
        convert_generic_topdown_checkpoint)
    from vitpose_tpu.train.loop import build_model_from_cfg
    from ref_cnn_loader import _ref_backbone

    torch.manual_seed(16)
    ref_mod = _ref_backbone('cpm')
    net = ref_mod.CPM(in_channels=3, out_channels=8, feat_channels=32,
                      num_stages=2)
    net.eval()
    x = np.random.RandomState(16).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x))[-1].numpy()
    sd = {f'backbone.{k}': v.detach().numpy()
          for k, v in net.state_dict().items()}
    model = build_model_from_cfg(dict(
        backbone_type='cpm',
        backbone_overrides=dict(out_channels=8, feat_channels=32,
                                num_stages=2),
        img_size=(64, 64), out_channels=8, head='identity',
        num_stages=2))
    variables = convert_generic_topdown_checkpoint(sd, 'cpm')
    out = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      train=False)
    _assert_close(np.asarray(out), ref, tol=5e-4)


def test_vipnas_mbv3_full_checkpoint_conversion():
    """ViPNAS-MobileNetV3 .pth: its head uses DEPTHWISE grouped deconvs
    (160 filters / 160 groups, reference vipnas_mbv3_coco config:39-40),
    unlike vipnas_res50's 144/16 — the config must plumb deconv_groups
    through to the head for conversion to line up."""
    import ref_cnn_loader as RL2
    from vitpose_tpu.utils.cnn_ckpt import (
        convert_generic_topdown_checkpoint)
    from vitpose_tpu.train.loop import build_model_from_cfg

    torch.manual_seed(17)
    bb = L.ref_vipnas_mbv3().ViPNAS_MobileNetV3()
    head = RL2.ref_vipnas_head().ViPNASHeatmapSimpleHead(
        in_channels=160, out_channels=8, num_deconv_layers=2,
        num_deconv_filters=(160, 160), num_deconv_kernels=(4, 4),
        num_deconv_groups=(160, 160), loss_keypoint=None)
    bb.eval(), head.eval()
    x = np.random.RandomState(17).randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        feat = bb(torch.from_numpy(x))
        feat = feat[-1] if isinstance(feat, (list, tuple)) else feat
        ref = head(feat).numpy()

    sd = {}
    sd.update({f'backbone.{k}': v.detach().numpy()
               for k, v in bb.state_dict().items()})
    sd.update({f'keypoint_head.{k}': v.detach().numpy()
               for k, v in head.state_dict().items()})
    model = build_model_from_cfg(dict(
        backbone_type='vipnas_mbv3',
        img_size=(64, 64), out_channels=8, head='vipnas',
        deconv_filters=(160, 160), deconv_groups=(160, 160)))
    variables = convert_generic_topdown_checkpoint(sd, 'vipnas_mbv3')
    out = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      train=False)
    _assert_close(np.asarray(out), ref, tol=5e-4)


def test_msmu_prm_conversion_parity():
    """RSN's Pose Refine Machine (use_prm=True): the channel+spatial
    attention refinement converts and matches the reference PredictHeatmap
    output (topdown_heatmap_multi_stage_head.py PRM)."""
    import ref_cnn_loader as RL2
    from vitpose_tpu.utils.cnn_ckpt import convert_msmu_head
    from vitpose_tpu.models.heads_extra import MSMUHead

    torch.manual_seed(18)
    head = RL2.ref_multistage_head().TopdownHeatmapMSMUHead(
        out_shape=(16, 12), unit_channels=24, out_channels=8,
        num_stages=1, num_units=2, use_prm=True, loss_keypoint=None)
    head.eval()
    feats = [[torch.randn(2, 24, 4, 3), torch.randn(2, 24, 8, 6)]]
    with torch.no_grad():
        refs = [o.numpy() for o in head(feats)]

    sd = {f'keypoint_head.{k}': v.detach().numpy()
          for k, v in head.state_dict().items()}
    params, stats = convert_msmu_head(sd, num_units=2, use_prm=True)
    model = MSMUHead(out_channels=8, num_stages=1, num_units=2,
                     out_shape=(16, 12), use_prm=True)
    feats_j = [[jnp.asarray(f.numpy().transpose(0, 2, 3, 1))
                for f in feats[0]]]
    outs = model.apply({'params': params, 'batch_stats': stats}, feats_j,
                       train=False)
    assert len(outs) == len(refs)
    for o, r in zip(outs, refs):
        _assert_close(np.asarray(o), r, tol=5e-4)

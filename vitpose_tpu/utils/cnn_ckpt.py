"""Torch->flax checkpoint converters for the CNN backbone zoo.

Name-mapping converters from the reference torch layouts
(mmpose/models/backbones/*.py) to our NHWC flax parameter trees. Every
converter returns (params, batch_stats) dicts ready for `model.apply`.
Conversion rules:
  * conv [O, I/g, kh, kw] -> kernel [kh, kw, I/g, O]  (plain/grouped/dw)
  * deconv [I, O, kh, kw] -> kernel [kh, kw, O, I]
  * linear [O, I] -> kernel [I, O]
  * BN weight/bias/running_mean/running_var -> scale/bias + mean/var
"""
from __future__ import annotations

import numpy as np


class Cv:
    """Mapping helper bound to a flat torch state dict."""

    def __init__(self, sd, prefix=''):
        self.sd = sd
        self.prefix = prefix
        self.params = {}
        self.stats = {}

    def _put(self, tree, path, v):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(v)

    def has(self, tname):
        return self.prefix + tname in self.sd

    def get(self, tname):
        return self.sd[self.prefix + tname]

    def conv(self, tname, fpath, bias=False):
        if not self.has(tname + '.weight'):
            return False
        fpath = tuple(fpath.split('/'))
        self._put(self.params, fpath + ('kernel',),
                  self.get(tname + '.weight').transpose(2, 3, 1, 0))
        if bias or self.has(tname + '.bias'):
            if self.has(tname + '.bias'):
                self._put(self.params, fpath + ('bias',),
                          self.get(tname + '.bias'))
        return True

    def linear(self, tname, fpath):
        if not self.has(tname + '.weight'):
            return False
        fpath = tuple(fpath.split('/'))
        w = self.get(tname + '.weight')
        # allow 1x1 convs to land on Dense params
        if w.ndim == 4:
            w = w[:, :, 0, 0]
        self._put(self.params, fpath + ('kernel',), w.T)
        if self.has(tname + '.bias'):
            self._put(self.params, fpath + ('bias',),
                      self.get(tname + '.bias'))
        return True

    def bn(self, tname, fpath):
        if not self.has(tname + '.weight'):
            return False
        fpath = tuple(fpath.split('/'))
        self._put(self.params, fpath + ('scale',),
                  self.get(tname + '.weight'))
        self._put(self.params, fpath + ('bias',), self.get(tname + '.bias'))
        self._put(self.stats, fpath + ('mean',),
                  self.get(tname + '.running_mean'))
        self._put(self.stats, fpath + ('var',),
                  self.get(tname + '.running_var'))
        return True

    def ln(self, tname, fpath):
        if not self.has(tname + '.weight'):
            return False
        fpath = tuple(fpath.split('/'))
        self._put(self.params, fpath + ('scale',),
                  self.get(tname + '.weight'))
        self._put(self.params, fpath + ('bias',), self.get(tname + '.bias'))
        return True

    def raw(self, tname, fpath):
        if not self.has(tname):
            return False
        fpath = tuple(fpath.split('/'))
        self._put(self.params, fpath, self.get(tname))
        return True

    def conv_module(self, tname, fpath):
        """mmcv ConvModule: {t}.conv + optional {t}.bn."""
        ok = self.conv(tname + '.conv', fpath + '_conv')
        self.bn(tname + '.bn', fpath + '_bn')
        return ok

    def out(self):
        return self.params, self.stats


def _put(tree, path, v):
    """Insert a leaf into a nested dict by path (shared by the standalone
    head converters; mirrors Cv._put)."""
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = np.asarray(v)


def _resnet_block(cv, tname, fname):
    """conv1..3/bn1..3 + downsample -> our BasicBlock/Bottleneck names."""
    for ci in (1, 2, 3):
        cv.conv(f'{tname}.conv{ci}', f'{fname}/conv{ci}')
        cv.bn(f'{tname}.bn{ci}', f'{fname}/bn{ci}')
    cv.conv(f'{tname}.downsample.0', f'{fname}/ds_conv')
    cv.bn(f'{tname}.downsample.1', f'{fname}/ds_bn')
    # SE gate (seresnet/seresnext): ConvModule fc convs -> Dense
    cv.linear(f'{tname}.se_layer.conv1.conv', f'{fname}/se/fc1')
    cv.linear(f'{tname}.se_layer.conv2.conv', f'{fname}/se/fc2')


def convert_resnext(sd, prefix=''):
    """ResNeXt / SE-ResNeXt (reference resnext.py / seresnext.py)."""
    cv = Cv(sd, prefix)
    cv.conv('conv1', 'conv1')
    cv.bn('bn1', 'bn1')
    for li in range(1, 5):
        bi = 0
        while cv.has(f'layer{li}.{bi}.conv1.weight'):
            _resnet_block(cv, f'layer{li}.{bi}', f'layer{li}_{bi}')
            bi += 1
    return cv.out()


convert_seresnet = convert_resnext      # identical naming (se handled above)


def convert_hrnet(sd, prefix=''):
    """HRNet (reference hrnet.py): stem + layer1 + transitions + staged
    exchange modules with fuse layers."""
    cv = Cv(sd, prefix)
    cv.conv('conv1', 'stem_conv1')
    cv.bn('bn1', 'stem_bn1')
    cv.conv('conv2', 'stem_conv2')
    cv.bn('bn2', 'stem_bn2')
    bi = 0
    while cv.has(f'layer1.{bi}.conv1.weight'):
        _resnet_block(cv, f'layer1.{bi}', f'layer1_{bi}')
        bi += 1
    # transition1: branch0 Sequential(conv, bn), branch1 nested Sequential
    cv.conv('transition1.0.0', 'tr1_conv0')
    cv.bn('transition1.0.1', 'tr1_bn0')
    cv.conv('transition1.1.0.0', 'tr1_conv1')
    cv.bn('transition1.1.0.1', 'tr1_bn1')
    for s in (2, 3, 4):                       # stages
        m = 0
        while cv.has(f'stage{s}.{m}.branches.0.0.conv1.weight'):
            for b in range(4):
                k = 0
                while cv.has(f'stage{s}.{m}.branches.{b}.{k}.conv1.weight'):
                    _resnet_block(
                        cv, f'stage{s}.{m}.branches.{b}.{k}',
                        f'stage{s}_mod{m}/branch{b}_block{k}')
                    k += 1
            for i in range(4):
                for j in range(4):
                    t = f'stage{s}.{m}.fuse_layers.{i}.{j}'
                    f = f'stage{s}_mod{m}'
                    if j > i:
                        cv.conv(f'{t}.0', f'{f}/fuse{i}_{j}_conv')
                        cv.bn(f'{t}.1', f'{f}/fuse{i}_{j}_bn')
                    elif j < i:
                        for d in range(i - j):
                            cv.conv(f'{t}.{d}.0',
                                    f'{f}/fuse{i}_{j}_down{d}_conv')
                            cv.bn(f'{t}.{d}.1',
                                  f'{f}/fuse{i}_{j}_down{d}_bn')
            m += 1
        # transition to the new branch (applied to the last existing one);
        # reference transition{s}.{s} follows our tr{s} naming
        if s < 4:
            cv.conv(f'transition{s}.{s}.0.0', f'tr{s}_conv')
            cv.bn(f'transition{s}.{s}.0.1', f'tr{s}_bn')
    return cv.out()


def convert_scnet(sd, prefix=''):
    """SCNet (reference scnet.py): self-calibrated bottlenecks."""
    cv = Cv(sd, prefix)
    cv.conv('conv1', 'conv1')
    cv.bn('bn1', 'bn1')
    for li in range(1, 5):
        bi = 0
        while cv.has(f'layer{li}.{bi}.conv1.weight'):
            t = f'layer{li}.{bi}'
            f = f'layer{li}_{bi}'
            cv.conv(f'{t}.conv1', f'{f}/a1')
            cv.bn(f'{t}.bn1', f'{f}/a1_bn')
            cv.conv(f'{t}.k1.0', f'{f}/a2')
            cv.bn(f'{t}.k1.1', f'{f}/a2_bn')
            cv.conv(f'{t}.conv2', f'{f}/b1')
            cv.bn(f'{t}.bn2', f'{f}/b1_bn')
            cv.conv(f'{t}.scconv.k2.1', f'{f}/scconv/k2')
            cv.bn(f'{t}.scconv.k2.2', f'{f}/scconv/k2_bn')
            cv.conv(f'{t}.scconv.k3.0', f'{f}/scconv/k3')
            cv.bn(f'{t}.scconv.k3.1', f'{f}/scconv/k3_bn')
            cv.conv(f'{t}.scconv.k4.0', f'{f}/scconv/k4')
            cv.bn(f'{t}.scconv.k4.1', f'{f}/scconv/k4_bn')
            cv.conv(f'{t}.conv3', f'{f}/out')
            cv.bn(f'{t}.bn3', f'{f}/out_bn')
            cv.conv(f'{t}.downsample.0', f'{f}/ds')
            cv.bn(f'{t}.downsample.1', f'{f}/ds_bn')
            bi += 1
    return cv.out()


def _mspn_bottleneck(cv, tname, fname):
    """MSPN Bottleneck: conv1..3/bn1..3 + ConvModule downsample."""
    for ci in (1, 2, 3):
        cv.conv(f'{tname}.conv{ci}', f'{fname}/conv{ci}')
        cv.bn(f'{tname}.bn{ci}', f'{fname}/bn{ci}')
    cv.conv(f'{tname}.downsample.conv', f'{fname}/ds_conv')
    cv.bn(f'{tname}.downsample.bn', f'{fname}/ds_bn')


def _rsb_block(cv, tname, fname):
    """RSN Residual Steps Block (rsn.py:12)."""
    cv.conv_module(f'{tname}.conv_bn_relu1', f'{fname}/conv_bn_relu1')
    i = 1
    while cv.has(f'{tname}.conv_bn_relu2_{i}_1.conv.weight'):
        for j in range(1, i + 1):
            cv.conv_module(f'{tname}.conv_bn_relu2_{i}_{j}',
                           f'{fname}/conv_bn_relu2_{i}_{j}')
        i += 1
    cv.conv_module(f'{tname}.conv_bn3', f'{fname}/conv_bn3')
    cv.conv_module(f'{tname}.downsample', f'{fname}/downsample')


def convert_mspn(sd, prefix=''):
    """MSPN / RSN (reference mspn.py:385 / rsn.py:512): ResNetTop + staged
    downsample/upsample hourglasses with skip/cross convs."""
    cv = Cv(sd, prefix)
    cv.conv_module('top.top.0', 'top')
    stage_key = ('multi_stage_mspn'
                 if any(k.startswith(prefix + 'multi_stage_mspn')
                        for k in sd) else 'multi_stage_rsn')
    st = 0
    while any(k.startswith(f'{prefix}{stage_key}.{st}.') for k in sd):
        t0 = f'{stage_key}.{st}'
        f0 = f'stage{st}'
        for u in range(1, 10):
            b = 0
            while True:
                t = f'{t0}.downsample.layer{u}.{b}'
                f = f'{f0}/downsample/layer{u}_{b}'
                if cv.has(f'{t}.conv1.weight'):
                    _mspn_bottleneck(cv, t, f)
                elif cv.has(f'{t}.conv_bn_relu1.conv.weight'):
                    _rsb_block(cv, t, f)
                else:
                    break
                b += 1
        for u in range(1, 10):
            t = f'{t0}.upsample.up{u}'
            f = f'{f0}/up{u}'
            if not cv.has(f'{t}.in_skip.conv.weight'):
                break
            for part in ('in_skip', 'up_conv', 'out_skip1', 'out_skip2',
                         'cross_conv'):
                cv.conv_module(f'{t}.{part}', f'{f}/{part}')
        st += 1
    return cv.out()


convert_rsn = convert_mspn


def convert_vipnas_mbv3(sd, dep=(0, 1, 4, 4, 4, 4, 4), prefix=''):
    """ViPNAS_MobileNetV3 (reference vipnas_mbv3.py): flat layer{n}
    InvertedResiduals in stage-major order -> our s{i}b{j} names."""
    cv = Cv(sd, prefix)
    cv.conv('conv1.conv', 'stem')
    cv.bn('conv1.bn', 'stem_bn')
    n = 1
    for i in range(1, len(dep)):
        for j in range(dep[i]):
            t = f'layer{n}'
            f = f's{i}b{j}'
            cv.conv(f'{t}.expand_conv.conv', f'{f}_expand')
            cv.bn(f'{t}.expand_conv.bn', f'{f}_expand_bn')
            cv.conv(f'{t}.depthwise_conv.conv', f'{f}_dw')
            cv.bn(f'{t}.depthwise_conv.bn', f'{f}_dw_bn')
            cv.linear(f'{t}.se.conv1.conv', f'{f}_se/fc1')
            cv.linear(f'{t}.se.conv2.conv', f'{f}_se/fc2')
            cv.conv(f'{t}.linear_conv.conv', f'{f}_proj')
            cv.bn(f'{t}.linear_conv.bn', f'{f}_proj_bn')
            n += 1
    return cv.out()


def convert_vipnas_resnet(sd, prefix=''):
    """ViPNAS_ResNet (reference vipnas_resnet.py): resnet naming + GCNet
    attention blocks."""
    cv = Cv(sd, prefix)
    cv.conv('conv1', 'conv1')
    cv.bn('bn1', 'bn1')
    for li in range(1, 5):
        bi = 0
        while cv.has(f'layer{li}.{bi}.conv1.weight'):
            t = f'layer{li}.{bi}'
            f = f'layer{li}_{bi}'
            for ci in (1, 2, 3):
                cv.conv(f'{t}.conv{ci}', f'{f}/conv{ci}')
                cv.bn(f'{t}.bn{ci}', f'{f}/bn{ci}')
            cv.conv(f'{t}.downsample.0', f'{f}/ds_conv')
            cv.bn(f'{t}.downsample.1', f'{f}/ds_bn')
            # GCNet ContextBlock: conv_mask + channel_add Sequential
            # (0: 1x1 conv, 1: LayerNorm([planes,1,1]), 3: 1x1 conv)
            cv.conv(f'{t}.attention.conv_mask', f'{f}/attention/conv_mask')
            cv.linear(f'{t}.attention.channel_add_conv.0',
                      f'{f}/attention/add_fc1')
            a = f'{t}.attention.channel_add_conv.1'
            if cv.has(a + '.weight'):
                cv._put(cv.params,
                        (*f'{f}/attention/add_ln'.split('/'), 'scale'),
                        cv.get(a + '.weight').reshape(-1))
                cv._put(cv.params,
                        (*f'{f}/attention/add_ln'.split('/'), 'bias'),
                        cv.get(a + '.bias').reshape(-1))
            cv.linear(f'{t}.attention.channel_add_conv.3',
                      f'{f}/attention/add_fc2')
            bi += 1
    return cv.out()


def convert_hrformer(sd, prefix=''):
    """HRFormer (reference hrformer.py): HRNet stem/stage1 + transformer
    branches with window attention (rel-pos bias) and CrossFFN, DW-sep
    fuse layers."""
    cv = Cv(sd, prefix)
    cv.conv('conv1', 'stem1')
    cv.bn('bn1', 'stem1_bn')
    cv.conv('conv2', 'stem2')
    cv.bn('bn2', 'stem2_bn')
    bi = 0
    while cv.has(f'layer1.{bi}.conv1.weight'):
        _resnet_block(cv, f'layer1.{bi}', f'layer1_{bi}')
        bi += 1
    cv.conv('transition1.0.0', 'tr1_conv0')
    cv.bn('transition1.0.1', 'tr1_bn0')
    cv.conv('transition1.1.0.0', 'tr1_conv1')
    cv.bn('transition1.1.0.1', 'tr1_bn1')
    for s in (2, 3, 4):
        st = s - 2                                   # our 0-based stage
        m = 0
        while cv.has(f'stage{s}.{m}.branches.0.0.norm1.weight'):
            for b in range(4):
                t = 0
                while cv.has(f'stage{s}.{m}.branches.{b}.{t}.norm1.weight'):
                    tb = f'stage{s}.{m}.branches.{b}.{t}'
                    fb = f's{st}_m{m}_b{b}_t{t}'
                    cv.ln(f'{tb}.norm1', f'{fb}/norm1')
                    cv.ln(f'{tb}.norm2', f'{fb}/norm2')
                    cv.linear(f'{tb}.attn.attn.qkv', f'{fb}/attn/qkv')
                    cv.linear(f'{tb}.attn.attn.proj', f'{fb}/attn/proj')
                    cv.raw(f'{tb}.attn.attn.relative_position_bias_table',
                           f'{fb}/attn/rel_pos_bias_table')
                    cv.conv(f'{tb}.ffn.fc1', f'{fb}/ffn_fc1')
                    cv.bn(f'{tb}.ffn.norm1', f'{fb}/ffn_bn1')
                    cv.conv(f'{tb}.ffn.dw3x3', f'{fb}/ffn_dw')
                    cv.bn(f'{tb}.ffn.norm2', f'{fb}/ffn_bn2')
                    cv.conv(f'{tb}.ffn.fc2', f'{fb}/ffn_fc2')
                    cv.bn(f'{tb}.ffn.norm3', f'{fb}/ffn_bn3')
                    t += 1
            f0 = f's{st}_m{m}_fuse'
            for i in range(4):
                for j in range(4):
                    tf = f'stage{s}.{m}.fuse_layers.{i}.{j}'
                    if j > i:
                        cv.conv(f'{tf}.0', f'{f0}/fuse{i}_{j}_conv')
                        cv.bn(f'{tf}.1', f'{f0}/fuse{i}_{j}_bn')
                    elif j < i:
                        for d in range(i - j):
                            cv.conv(f'{tf}.{d}.0',
                                    f'{f0}/fuse{i}_{j}_d{d}_dw')
                            cv.bn(f'{tf}.{d}.1',
                                  f'{f0}/fuse{i}_{j}_d{d}_dwbn')
                            cv.conv(f'{tf}.{d}.2',
                                    f'{f0}/fuse{i}_{j}_d{d}_pw')
                            cv.bn(f'{tf}.{d}.3',
                                  f'{f0}/fuse{i}_{j}_d{d}_pwbn')
            m += 1
        if s < 4:
            cv.conv(f'transition{s}.{s}.0.0', f'tr{s}')
            cv.bn(f'transition{s}.{s}.0.1', f'tr{s}_bn')
    return cv.out()


def convert_litehrnet(sd, prefix=''):
    """Lite-HRNet (reference litehrnet.py:738)."""
    cv = Cv(sd, prefix)
    cv.conv('stem.conv1.conv', 'stem/conv1')
    cv.bn('stem.conv1.bn', 'stem/conv1_bn')
    cv.conv('stem.branch1.0.conv', 'stem/b1_dw')
    cv.bn('stem.branch1.0.bn', 'stem/b1_dw_bn')
    cv.conv('stem.branch1.1.conv', 'stem/b1_pw')
    cv.bn('stem.branch1.1.bn', 'stem/b1_pw_bn')
    for t, f in (('expand_conv', 'expand'), ('depthwise_conv', 'dw'),
                 ('linear_conv', 'linear')):
        cv.conv(f'stem.{t}.conv', f'stem/{f}')
        cv.bn(f'stem.{t}.bn', f'stem/{f}_bn')
    si = 0
    while any(k.startswith(f'{prefix}stage{si}.') for k in sd):
        # transitions
        for b in range(8):
            t = f'transition{si}.{b}'
            if cv.has(f'{t}.0.weight'):            # existing-branch remap
                cv.conv(f'{t}.0', f'tr{si}_{b}_dw')
                cv.bn(f'{t}.1', f'tr{si}_{b}_dwbn')
                cv.conv(f'{t}.2', f'tr{si}_{b}_pw')
                cv.bn(f'{t}.3', f'tr{si}_{b}_pwbn')
            else:                                  # new-branch chains
                k = 0
                while cv.has(f'{t}.{k}.0.weight'):
                    cv.conv(f'{t}.{k}.0', f'tr{si}_{b}_c{k}_dw')
                    cv.bn(f'{t}.{k}.1', f'tr{si}_{b}_c{k}_dwbn')
                    cv.conv(f'{t}.{k}.2', f'tr{si}_{b}_c{k}_pw')
                    cv.bn(f'{t}.{k}.3', f'tr{si}_{b}_c{k}_pwbn')
                    k += 1
        m = 0
        while cv.has(f'stage{si}.{m}.layers.0.cross_resolution_weighting'
                     '.conv1.conv.weight'):
            for k in range(8):
                t = f'stage{si}.{m}.layers.{k}'
                f = f'stage{si}_m{m}_blk{k}'
                if not cv.has(f'{t}.cross_resolution_weighting'
                              '.conv1.conv.weight'):
                    break
                cv.conv(f'{t}.cross_resolution_weighting.conv1.conv',
                        f'{f}/crw/conv1')
                cv.bn(f'{t}.cross_resolution_weighting.conv1.bn',
                      f'{f}/crw/conv1_bn')
                cv.conv(f'{t}.cross_resolution_weighting.conv2.conv',
                        f'{f}/crw/conv2')
                cv.bn(f'{t}.cross_resolution_weighting.conv2.bn',
                      f'{f}/crw/conv2_bn')
                for b in range(8):
                    if not cv.has(f'{t}.depthwise_convs.{b}.conv.weight'):
                        break
                    cv.conv(f'{t}.depthwise_convs.{b}.conv', f'{f}/dw{b}')
                    cv.bn(f'{t}.depthwise_convs.{b}.bn', f'{f}/dw{b}_bn')
                    cv.linear(f'{t}.spatial_weighting.{b}.conv1.conv',
                              f'{f}/sw{b}/fc1')
                    cv.linear(f'{t}.spatial_weighting.{b}.conv2.conv',
                              f'{f}/sw{b}/fc2')
            f0 = f'stage{si}_m{m}_fuse'
            for i in range(8):
                for j in range(8):
                    tf = f'stage{si}.{m}.fuse_layers.{i}.{j}'
                    if j > i:
                        cv.conv(f'{tf}.0', f'{f0}/fuse{i}_{j}_conv')
                        cv.bn(f'{tf}.1', f'{f0}/fuse{i}_{j}_bn')
                    elif j < i:
                        for d in range(i - j):
                            cv.conv(f'{tf}.{d}.0',
                                    f'{f0}/fuse{i}_{j}_d{d}_dw')
                            cv.bn(f'{tf}.{d}.1',
                                  f'{f0}/fuse{i}_{j}_d{d}_dwbn')
                            cv.conv(f'{tf}.{d}.2',
                                    f'{f0}/fuse{i}_{j}_d{d}_pw')
                            cv.bn(f'{tf}.{d}.3',
                                  f'{f0}/fuse{i}_{j}_d{d}_pwbn')
            m += 1
        si += 1
    return cv.out()


def convert_ae_higher_head(sd, prefix=''):
    """AEHigherResolutionHead (reference ae_higher_resolution_head.py:13)."""
    cv = Cv(sd, prefix)
    i = 0
    while cv.has(f'final_layers.{i}.weight'):
        # plain conv with bias
        cv._put(cv.params, (f'final_{i}', 'kernel'),
                cv.get(f'final_layers.{i}.weight').transpose(2, 3, 1, 0))
        cv._put(cv.params, (f'final_{i}', 'bias'),
                cv.get(f'final_layers.{i}.bias'))
        i += 1
    d = 0
    while cv.has(f'deconv_layers.{d}.0.0.weight'):
        # torch ConvTranspose2d [I, O, kh, kw] -> flax transpose_kernel
        cv._put(cv.params, (f'deconv_{d}', 'kernel'),
                cv.get(f'deconv_layers.{d}.0.0.weight')
                .transpose(2, 3, 1, 0))
        cv.bn(f'deconv_layers.{d}.0.1', f'deconv_{d}_bn')
        b = 0
        while cv.has(f'deconv_layers.{d}.{b + 1}.0.conv1.weight'):
            _resnet_block(cv, f'deconv_layers.{d}.{b + 1}.0',
                          f'deconv_{d}_blk{b}')
            b += 1
        d += 1
    return cv.out()


def _res_layer_blocks(cv, tname, fname):
    k = 0
    while cv.has(f'{tname}.{k}.conv1.weight'):
        _resnet_block(cv, f'{tname}.{k}', f'{fname}_{k}')
        k += 1


def _hourglass_module(cv, tname, fname, depth):
    _res_layer_blocks(cv, f'{tname}.up1', f'{fname}/up1')
    _res_layer_blocks(cv, f'{tname}.low1', f'{fname}/low1')
    if depth > 1:
        _hourglass_module(cv, f'{tname}.low2', f'{fname}/low2', depth - 1)
    else:
        _res_layer_blocks(cv, f'{tname}.low2', f'{fname}/low2')
    _res_layer_blocks(cv, f'{tname}.low3', f'{fname}/low3')


def convert_hourglass(sd, downsample_times=None, prefix=''):
    """HourglassNet (reference hourglass.py:89). downsample_times=None
    infers the nesting depth from the state-dict key structure."""
    if downsample_times is None:
        d = 0
        while (f'{prefix}hourglass_modules.0' + '.low2' * (d + 1)
               + '.low1.0.conv1.weight') in sd:
            d += 1
        downsample_times = d + 1
    cv = Cv(sd, prefix)
    cv.conv_module('stem.0', 'stem')
    _res_layer_blocks(cv, 'stem.1', 'stem_res')
    i = 0
    while cv.has(f'hourglass_modules.{i}.up1.0.conv1.weight'):
        _hourglass_module(cv, f'hourglass_modules.{i}', f'hg{i}',
                          downsample_times)
        cv.conv_module(f'out_convs.{i}', f'out_conv{i}')
        cv.conv_module(f'conv1x1s.{i}', f'conv1x1_{i}')
        cv.conv_module(f'remap_convs.{i}', f'remap{i}')
        if cv.has(f'inters.{i}.conv1.weight'):
            _resnet_block(cv, f'inters.{i}', f'inters_{i}_0')
        i += 1
    return cv.out()


def _hourglass_ae_module(cv, tname, fname, depth):
    cv.conv_module(f'{tname}.up1', f'{fname}/up1')
    cv.conv_module(f'{tname}.low1', f'{fname}/low1')
    if depth > 1:
        _hourglass_ae_module(cv, f'{tname}.low2', f'{fname}/low2',
                             depth - 1)
    else:
        cv.conv_module(f'{tname}.low2', f'{fname}/low2')
    cv.conv_module(f'{tname}.low3', f'{fname}/low3')


def convert_hourglass_ae(sd, downsample_times=4, prefix=''):
    """HourglassAENet (reference hourglass_ae.py:70)."""
    cv = Cv(sd, prefix)
    for i, t in enumerate((0, 1, 3, 4)):        # index 2 is the maxpool
        cv.conv_module(f'stem.{t}', f'stem{i}')
    i = 0
    while cv.has(f'hourglass_modules.{i}.0.up1.conv.weight'):
        _hourglass_ae_module(cv, f'hourglass_modules.{i}.0', f'hg{i}',
                             downsample_times)
        cv.conv_module(f'hourglass_modules.{i}.1', f'hgc{i}_0')
        cv.conv_module(f'hourglass_modules.{i}.2', f'hgc{i}_1')
        cv.conv(f'out_convs.{i}.conv', f'out_conv{i}_conv')
        cv.conv_module(f'remap_out_convs.{i}', f'remap_out{i}')
        cv.conv_module(f'remap_feature_convs.{i}', f'remap_feat{i}')
        i += 1
    return cv.out()


def convert_tcn(sd, prefix=''):
    """TCN (reference tcn.py): Conv1d [O, I, k] -> flax [k, I, O]."""
    cv = Cv(sd, prefix)

    def conv1d(tname, fpath):
        if not cv.has(tname + '.weight'):
            return
        cv._put(cv.params, tuple(fpath.split('/')) + ('kernel',),
                cv.get(tname + '.weight').transpose(2, 1, 0))
        if cv.has(tname + '.bias'):
            cv._put(cv.params, tuple(fpath.split('/')) + ('bias',),
                    cv.get(tname + '.bias'))

    conv1d('expand_conv.conv', 'stem_conv')
    cv.bn('expand_conv.bn', 'stem_bn')
    i = 0
    while cv.has(f'tcn_blocks.{i}.conv1.0.conv.weight'):
        conv1d(f'tcn_blocks.{i}.conv1.0.conv', f'block{i}_conv1')
        cv.bn(f'tcn_blocks.{i}.conv1.0.bn', f'block{i}_bn1')
        conv1d(f'tcn_blocks.{i}.conv2.0.conv', f'block{i}_conv2')
        cv.bn(f'tcn_blocks.{i}.conv2.0.bn', f'block{i}_bn2')
        i += 1
    return cv.out()


def convert_mobilenet_v2(sd, prefix=''):
    """MobileNetV2 (reference mobilenet_v2.py): conv1 + layer1..7 inverted
    residuals (+final conv2)."""
    cv = Cv(sd, prefix)
    cv.conv('conv1.conv', 'stem')
    cv.bn('conv1.bn', 'stem_bn')
    for li in range(1, 8):
        bi = 0
        while cv.has(f'layer{li}.{bi}.conv.0.conv.weight'):
            t = f'layer{li}.{bi}.conv'
            f = f'layer{li - 1}_{bi}'
            # expand_ratio==1 blocks have 2 ConvModules (dw, project)
            n = 3 if cv.has(f'{t}.2.conv.weight') else 2
            names = (['expand', 'dw', 'project'] if n == 3
                     else ['dw', 'project'])
            for k, nm in enumerate(names):
                cv.conv(f'{t}.{k}.conv', f'{f}/{nm}')
                cv.bn(f'{t}.{k}.bn', f'{f}/{nm}_bn')
            bi += 1
    cv.conv('conv2.conv', 'head_conv')
    cv.bn('conv2.bn', 'head_bn')
    return cv.out()


def convert_shufflenet_v2(sd, prefix=''):
    """ShuffleNetV2 (reference shufflenet_v2.py)."""
    cv = Cv(sd, prefix)
    cv.conv('conv1.conv', 'stem')
    cv.bn('conv1.bn', 'stem_bn')
    for s in range(3):
        b = 0
        while cv.has(f'layers.{s}.{b}.branch2.0.conv.weight'):
            t = f'layers.{s}.{b}'
            f = f'stage{s}_{b}'
            if cv.has(f'{t}.branch1.0.conv.weight'):   # stride-2 unit
                cv.conv(f'{t}.branch1.0.conv', f'{f}/proj_dw')
                cv.bn(f'{t}.branch1.0.bn', f'{f}/proj_dwbn')
                cv.conv(f'{t}.branch1.1.conv', f'{f}/proj_pw')
                cv.bn(f'{t}.branch1.1.bn', f'{f}/proj_bn')
            cv.conv(f'{t}.branch2.0.conv', f'{f}/main_pw1')
            cv.bn(f'{t}.branch2.0.bn', f'{f}/main_bn1')
            cv.conv(f'{t}.branch2.1.conv', f'{f}/main_dw')
            cv.bn(f'{t}.branch2.1.bn', f'{f}/main_dwbn')
            cv.conv(f'{t}.branch2.2.conv', f'{f}/main_pw2')
            cv.bn(f'{t}.branch2.2.bn', f'{f}/main_bn2')
            b += 1
    # final 1x1 ConvModule lives in layers.3 (a bare ConvModule)
    cv.conv('layers.3.conv', 'head_conv')
    cv.bn('layers.3.bn', 'head_bn')
    return cv.out()


def convert_cpm(sd, prefix=''):
    """CPM (reference cpm.py:53)."""
    cv = Cv(sd, prefix)
    # stem: Sequential indices with maxpools at 1, 3, 5
    stem_map = [(0, 'stem0'), (2, 'stem1'), (4, 'stem2'), (6, 'stem3'),
                (7, 'stem4'), (8, 'stem5')]
    for ti, f in stem_map:
        cv.conv(f'stem.{ti}.conv', f'{f}_conv')
        cv.bn(f'stem.{ti}.bn', f'{f}_bn')
    cv.conv('stem.9.conv', 'stem6_conv')            # final, bias, no bn
    for ti, f in [(0, 'mid0'), (2, 'mid1'), (4, 'mid2')]:
        cv.conv(f'middle.{ti}.conv', f'{f}_conv')
        cv.bn(f'middle.{ti}.bn', f'{f}_bn')
    t = 0
    while cv.has(f'cpm_stages.{t}.model.0.conv.weight'):
        cv.conv(f'middle_conv.{t}.0.conv', f'midconv{t}_conv')
        cv.bn(f'middle_conv.{t}.0.bn', f'midconv{t}_bn')
        for i in range(3):
            cv.conv(f'cpm_stages.{t}.model.{i}.conv', f'stage{t}_b{i}_conv')
            cv.bn(f'cpm_stages.{t}.model.{i}.bn', f'stage{t}_b{i}_bn')
        cv.conv(f'out_convs.{t}.0.conv', f'stage{t}_fc_conv')
        cv.bn(f'out_convs.{t}.0.bn', f'stage{t}_fc_bn')
        cv.conv(f'out_convs.{t}.1.conv', f'stage{t}_out_conv')
        t += 1
    return cv.out()


# ---------------------------------------------------------------------------
# Full-model conversion for CNN-backbone TopDown checkpoints

def convert_vipnas_head(sd, prefix='keypoint_head.'):
    """ViPNASHeatmapSimpleHead (reference vipnas_heatmap_simple_head.py):
    grouped deconv Sequential [deconv, BN, ReLU] * n + final 1x1 conv ->
    our ViPNASHead's per-group deconv_{i}_{gi} kernels + bn_{i} + final.
    Torch grouped ConvTranspose2d weight is [in, out/g, kh, kw] with the
    input dim blocked by group."""
    params, stats = {}, {}

    di = 0
    while f'{prefix}deconv_layers.{di * 3}.weight' in sd:
        w = np.asarray(sd[f'{prefix}deconv_layers.{di * 3}.weight'])
        bnp = f'{prefix}deconv_layers.{di * 3 + 1}'
        # grouped ConvTranspose2d weight is [in, out/g, kh, kw]; the
        # following BN sees the full out channel count, so g = BN/out_per
        out_total = len(np.asarray(sd[f'{bnp}.weight']))
        in_ch, out_per = w.shape[0], w.shape[1]
        g = max(1, out_total // out_per)
        per_in = in_ch // g
        for gi in range(g):
            _put(params, (f'deconv_{di}_{gi}', 'kernel'),
                w[gi * per_in:(gi + 1) * per_in].transpose(2, 3, 1, 0))
        _put(params, (f'bn_{di}', 'scale'), sd[f'{bnp}.weight'])
        _put(params, (f'bn_{di}', 'bias'), sd[f'{bnp}.bias'])
        _put(stats, (f'bn_{di}', 'mean'), sd[f'{bnp}.running_mean'])
        _put(stats, (f'bn_{di}', 'var'), sd[f'{bnp}.running_var'])
        di += 1
    if f'{prefix}final_layer.weight' in sd:
        _put(params, ('final', 'kernel'),
            np.asarray(sd[f'{prefix}final_layer.weight']
                       ).transpose(2, 3, 1, 0))
        _put(params, ('final', 'bias'), sd[f'{prefix}final_layer.bias'])
    return params, stats


def convert_multistage_head(sd, prefix='keypoint_head.'):
    """TopdownHeatmapMultiStageHead (reference
    topdown_heatmap_multi_stage_head.py:63): per-stage deconv Sequential
    (or Identity) + per-stage final conv -> our MultiStageHead's
    stage_{i}/(deconv_{j}, bn_{j}, final)."""
    params, stats = {}, {}

    si = 0
    while (f'{prefix}multi_final_layers.{si}.weight' in sd
           or f'{prefix}multi_deconv_layers.{si}.0.weight' in sd):
        di = 0
        while f'{prefix}multi_deconv_layers.{si}.{di * 3}.weight' in sd:
            w = np.asarray(
                sd[f'{prefix}multi_deconv_layers.{si}.{di * 3}.weight'])
            _put(params, (f'stage_{si}', f'deconv_{di}', 'kernel'),
                w.transpose(2, 3, 1, 0))
            bnp = f'{prefix}multi_deconv_layers.{si}.{di * 3 + 1}'
            _put(params, (f'stage_{si}', f'bn_{di}', 'scale'),
                sd[f'{bnp}.weight'])
            _put(params, (f'stage_{si}', f'bn_{di}', 'bias'),
                sd[f'{bnp}.bias'])
            _put(stats, (f'stage_{si}', f'bn_{di}', 'mean'),
                sd[f'{bnp}.running_mean'])
            _put(stats, (f'stage_{si}', f'bn_{di}', 'var'),
                sd[f'{bnp}.running_var'])
            di += 1
        fk = f'{prefix}multi_final_layers.{si}.weight'
        if fk in sd:
            _put(params, (f'stage_{si}', 'final', 'kernel'),
                np.asarray(sd[fk]).transpose(2, 3, 1, 0))
            _put(params, (f'stage_{si}', 'final', 'bias'),
                sd[f'{prefix}multi_final_layers.{si}.bias'])
        si += 1
    return params, stats


def convert_msmu_head(sd, prefix='keypoint_head.', num_units=4,
                      use_prm=False):
    """TopdownHeatmapMSMUHead (reference PredictHeatmap per stage-unit:
    ConvModule(1x1)+BN+ReLU, ConvModule(3x3)+BN, align-corners resize) ->
    our MSMUHead s{i}_u{j}_conv1/bn1/conv2/bn2 names. num_units must
    match the checkpoint's config (index = stage * num_units + unit);
    use_prm must match the target model's flag or the refinement would be
    silently dropped / missing."""
    has_prm = any('.prm.' in k for k in sd if k.startswith(prefix))
    if has_prm and not use_prm:
        raise ValueError(
            'checkpoint contains PRM (Pose Refine Machine) weights but the '
            'model config has use_prm=False — set model.use_prm=True or '
            'the refinement would be silently dropped')
    if use_prm and not has_prm:
        raise ValueError(
            'model config has use_prm=True but the checkpoint carries no '
            'predict_layers.*.prm weights')
    params, stats = {}, {}

    def _bn(t, fpath):
        _put(params, fpath + ('scale',), sd[f'{t}.weight'])
        _put(params, fpath + ('bias',), sd[f'{t}.bias'])
        _put(stats, fpath + ('mean',), sd[f'{t}.running_mean'])
        _put(stats, fpath + ('var',), sd[f'{t}.running_var'])

    idx = 0
    while f'{prefix}predict_layers.{idx}.conv_layers.0.conv.weight' in sd:
        si, ui = idx // num_units, idx % num_units
        nm = f's{si}_u{ui}'
        for ci, (cname, bname) in enumerate(((f'{nm}_conv1', f'{nm}_bn1'),
                                             (f'{nm}_conv2', f'{nm}_bn2'))):
            t = f'{prefix}predict_layers.{idx}.conv_layers.{ci}'
            _put(params, (cname, 'kernel'),
                 np.asarray(sd[f'{t}.conv.weight']).transpose(2, 3, 1, 0))
            _bn(f'{t}.bn', (bname,))
        prm = f'{prefix}predict_layers.{idx}.prm'
        if f'{prm}.conv_bn_relu_prm_1.conv.weight' in sd:
            pn = (f'{nm}_prm',)
            _put(params, pn + ('prm1_conv', 'kernel'),
                 np.asarray(sd[f'{prm}.conv_bn_relu_prm_1.conv.weight']
                            ).transpose(2, 3, 1, 0))
            _bn(f'{prm}.conv_bn_relu_prm_1.bn', pn + ('prm1_bn',))
            # middle path: Linear 0 / BN1d 1 / Linear 3 / BN1d 4
            _put(params, pn + ('mid_fc1', 'kernel'),
                 np.asarray(sd[f'{prm}.middle_path.0.weight']).T)
            _put(params, pn + ('mid_fc1', 'bias'),
                 sd[f'{prm}.middle_path.0.bias'])
            _bn(f'{prm}.middle_path.1', pn + ('mid_bn1',))
            _put(params, pn + ('mid_fc2', 'kernel'),
                 np.asarray(sd[f'{prm}.middle_path.3.weight']).T)
            _put(params, pn + ('mid_fc2', 'bias'),
                 sd[f'{prm}.middle_path.3.bias'])
            _bn(f'{prm}.middle_path.4', pn + ('mid_bn2',))
            # bottom path: 1x1 ConvModule, dw-sep k9, sigmoid
            _put(params, pn + ('bot_conv', 'kernel'),
                 np.asarray(sd[f'{prm}.bottom_path.0.conv.weight']
                            ).transpose(2, 3, 1, 0))
            _bn(f'{prm}.bottom_path.0.bn', pn + ('bot_bn',))
            _put(params, pn + ('bot_dw_conv', 'kernel'),
                 np.asarray(sd[f'{prm}.bottom_path.1.depthwise_conv'
                               f'.conv.weight']).transpose(2, 3, 1, 0))
            _bn(f'{prm}.bottom_path.1.depthwise_conv.bn',
                pn + ('bot_dw_bn',))
            _put(params, pn + ('bot_pw_conv', 'kernel'),
                 np.asarray(sd[f'{prm}.bottom_path.1.pointwise_conv'
                               f'.conv.weight']).transpose(2, 3, 1, 0))
            _bn(f'{prm}.bottom_path.1.pointwise_conv.bn',
                pn + ('bot_pw_bn',))
        idx += 1
    return params, stats


def _resnet_v1d_converter(sd, prefix=''):
    """ResNetV1d: deep stem (stem.{i}.conv/bn) + avg_down downsample index
    shift — handled by models.resnet.convert_resnet_checkpoint."""
    from ..models.resnet import convert_resnet_checkpoint
    return convert_resnet_checkpoint(sd, prefix=prefix)


# Backbone converters for full-model .pth conversion; most families pair
# with TopdownHeatmapSimpleHead (convert_head), HEAD_CONVERTERS below
# overrides the head layout per family (multistage, grouped ViPNAS,
# MSMU PredictHeatmap, identity CPM head).
BACKBONE_CONVERTERS = {
    'resnet': convert_resnext,           # identical layer naming
    'resnet_v1d': _resnet_v1d_converter,
    'resnext': convert_resnext,
    'seresnet': convert_seresnet,
    'seresnext': convert_resnext,
    'hrnet': convert_hrnet,
    'hrnetv2': convert_hrnet,            # same backbone, concat output
    'scnet': convert_scnet,
    'litehrnet': convert_litehrnet,
    'hrformer': convert_hrformer,
    'mobilenet_v2': convert_mobilenet_v2,
    'shufflenet_v2': convert_shufflenet_v2,
    'hourglass': convert_hourglass,      # + multistage head
    'vipnas_mbv3': convert_vipnas_mbv3,  # + grouped-deconv head
    'vipnas_resnet': convert_vipnas_resnet,
    'mspn': convert_mspn,                # + MSMU PredictHeatmap head
    'rsn': convert_rsn,
    'cpm': convert_cpm,                  # head is Identity (reference
                                         # cpm_coco config final_conv_kernel=0)
}

# per-family head converters (default: the SimpleHead layout)
HEAD_CONVERTERS = {
    'hourglass': convert_multistage_head,
    'vipnas_mbv3': convert_vipnas_head,
    'vipnas_resnet': convert_vipnas_head,
    'mspn': convert_msmu_head,
    'rsn': convert_msmu_head,
    'cpm': lambda sd, prefix='keypoint_head.': ({}, {}),
}


def convert_generic_topdown_checkpoint(path_or_sd, backbone_type,
                                       num_units=4, use_prm=False):
    """Reference TopDown .pth (CNN backbone + TopdownHeatmapSimpleHead) ->
    flax variables for GenericTopDown (train/loop.py build_generic_topdown).

    The ViT counterpart is torch_ckpt.convert_topdown_checkpoint; this is
    the same user path (`tools/test.py CONFIG ckpt.pth`) for the
    HRNet/ResNet/... config zoo.
    """
    from .torch_ckpt import load_torch_state_dict, convert_head
    sd = (load_torch_state_dict(path_or_sd)
          if isinstance(path_or_sd, str) else dict(path_or_sd))
    if backbone_type not in BACKBONE_CONVERTERS:
        raise KeyError(
            f'no full-model torch converter for backbone_type '
            f'{backbone_type!r} (multistage/ViPNAS heads have different '
            f'layouts); available: {sorted(BACKBONE_CONVERTERS)}')
    bb_params, bb_stats = BACKBONE_CONVERTERS[backbone_type](
        sd, prefix='backbone.')
    head_cv = HEAD_CONVERTERS.get(backbone_type)
    if head_cv is convert_msmu_head:
        head_params, head_stats = head_cv(sd, prefix='keypoint_head.',
                                          num_units=num_units,
                                          use_prm=use_prm)
    elif head_cv is not None:
        head_params, head_stats = head_cv(sd, prefix='keypoint_head.')
    else:
        head_params, head_stats = convert_head(sd, prefix='keypoint_head.')
    if (backbone_type != 'cpm' and not head_params
            and any(k.startswith('keypoint_head.') for k in sd)):
        raise ValueError(
            f'keypoint_head.* keys present but none matched the expected '
            f'{backbone_type} head layout — the checkpoint was likely '
            'saved from a different head configuration')
    params = {'backbone': bb_params}
    if head_params:
        params['head'] = head_params
    batch_stats = {}
    if bb_stats:
        batch_stats['backbone'] = bb_stats
    if head_stats:
        batch_stats['head'] = head_stats
    variables = {'params': params}
    if batch_stats:
        variables['batch_stats'] = batch_stats
    return variables

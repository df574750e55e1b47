"""Torch .pth -> flax variables for the NON-top-down model families.

Counterpart of the reference tools/test.py contract, where ONE CLI
evaluates a released checkpoint for every detector family
(reference tools/test.py:87-180 via init_pose_model + load_checkpoint):

  * bottomup      — AssociativeEmbedding: backbone + AE head
                    (associative_embedding.py:28)
  * pose_lifter   — TCN backbone + TemporalRegressionHead
                    (pose_lifter.py:24)
  * interhand3d   — ResNet + Interhand3DHead right/left Heatmap3DHead
                    stacks + Heatmap1DHead + MultilabelClassificationHead
                    (interhand_3d.py, interhand_3d_head.py:300-316)
  * posewarper    — backbone + PoseWarperNeck + heatmap head
                    (posewarper.py, posewarper_neck.py)
  * mesh          — ResNet + HMRMeshHead (rot6d) (mesh.py, hmr_head.py)
  * voxelpose     — DetectAndRegress: human_detector.center_net +
                    pose_regressor.pose_net V2VNets (multiview_pose.py:132)

Every converter returns variables shaped exactly like the family model's
own ``init`` so ``tools/test.py CONFIG ckpt.pth`` drops in for the
``.npz`` path.
"""
from __future__ import annotations

import numpy as np

from .cnn_ckpt import BACKBONE_CONVERTERS, Cv
from .torch_ckpt import convert_head, load_torch_state_dict


def _merge(params_stats_list):
    """[(name, params, stats), ...] -> {'params': ..., 'batch_stats': ...}
    (empty subtrees dropped)."""
    params, stats = {}, {}
    for name, p, s in params_stats_list:
        if p:
            params[name] = p
        if s:
            stats[name] = s
    out = {'params': params}
    if stats:
        out['batch_stats'] = stats
    return out


def _vars(p, s):
    out = {'params': p}
    if s:
        out['batch_stats'] = s
    return out


def _deconv(cv, tname, fpath):
    """torch ConvTranspose2d [I, O, kh, kw] -> flax transpose_kernel
    [kh, kw, O, I]."""
    if not cv.has(tname + '.weight'):
        return False
    cv._put(cv.params, tuple(fpath.split('/')) + ('kernel',),
            cv.get(tname + '.weight').transpose(2, 3, 1, 0))
    if cv.has(tname + '.bias'):
        cv._put(cv.params, tuple(fpath.split('/')) + ('bias',),
                cv.get(tname + '.bias'))
    return True


def _backbone(sd, cfg, default='resnet'):
    bt = cfg['model'].get('backbone_type', default)
    if bt not in BACKBONE_CONVERTERS:
        raise KeyError(f'no torch converter for backbone_type {bt!r}')
    return BACKBONE_CONVERTERS[bt](sd, prefix='backbone.')


# ---------------------------------------------------------------------------
# bottom-up (AssociativeEmbedding)
# ---------------------------------------------------------------------------

def _convert_ae_multi_head(sd, prefix='keypoint_head.'):
    """AEMultiStageHead (reference ae_multi_stage_head.py:12):
    multi_deconv_layers.{s}.* + multi_final_layers.{s} -> s{s}_deconv_{i} /
    s{s}_bn_{i} / s{s}_final (identity layers produce no tensors)."""
    cv = Cv(sd, prefix)
    si = 0
    while True:
        found = False
        di = 0
        while cv.has(f'multi_deconv_layers.{si}.{di * 3}.weight'):
            _deconv(cv, f'multi_deconv_layers.{si}.{di * 3}',
                    f's{si}_deconv_{di}')
            cv.bn(f'multi_deconv_layers.{si}.{di * 3 + 1}',
                  f's{si}_bn_{di}')
            found = True
            di += 1
        if cv.conv(f'multi_final_layers.{si}', f's{si}_final', bias=True):
            found = True
        if not found:
            break
        si += 1
    return cv.out()


def convert_bottomup_checkpoint(sd, cfg):
    """AssociativeEmbedding .pth -> BottomUpEstimator variables
    ({'backbone': vars, 'head': vars}, models/bottomup.py init)."""
    bb_p, bb_s = _backbone(sd, cfg, default='hrnet')
    kind = cfg['model'].get('head', 'ae')
    if kind == 'ae_higher':
        from .cnn_ckpt import convert_ae_higher_head
        hp, hs = convert_ae_higher_head(sd, prefix='keypoint_head.')
    elif kind == 'ae_multi':
        hp, hs = _convert_ae_multi_head(sd)
    else:
        # AESimpleHead is the DeconvHead layout (ae_simple_head.py);
        # our AEHead wraps DeconvHead under the 'deconv_head' scope
        p, s = convert_head(sd, prefix='keypoint_head.')
        hp = {'deconv_head': p} if p else {}
        hs = {'deconv_head': s} if s else {}
    return {'backbone': _vars(bb_p, bb_s), 'head': _vars(hp, hs)}


# ---------------------------------------------------------------------------
# pose lifter (SimpleBaseline3D / VideoPose3D)
# ---------------------------------------------------------------------------

def _lifter_head(sd, prefix, cv):
    """TemporalRegressionHead: a 1x1 Conv1d (temporal_regression_head.py:52)
    -> our Dense 'fc'."""
    w = sd.get(prefix + 'conv.weight')
    if w is None:
        return {}
    out = {'fc': {'kernel': np.asarray(w)[:, :, 0].T}}
    if prefix + 'conv.bias' in sd:
        out['fc']['bias'] = np.asarray(sd[prefix + 'conv.bias'])
    return out


def convert_pose_lifter_checkpoint(sd, cfg):
    """PoseLifter .pth -> flax variables for models/pose3d.PoseLifter
    (one tree: backbone/head (+ traj_backbone/traj_head when the
    semi-supervised trajectory branch is present, pose_lifter.py:73-82))."""
    from .cnn_ckpt import convert_tcn
    bb_p, bb_s = convert_tcn(sd, prefix='backbone.')
    if not bb_p:
        raise ValueError('no backbone.* TCN tensors found in checkpoint')
    parts = [('backbone', bb_p, bb_s),
             ('head', _lifter_head(sd, 'keypoint_head.', None), {})]
    tb_p, tb_s = convert_tcn(sd, prefix='traj_backbone.')
    if tb_p:
        parts += [('traj_backbone', tb_p, tb_s),
                  ('traj_head', _lifter_head(sd, 'traj_head.', None), {})]
    return _merge(parts)


# ---------------------------------------------------------------------------
# interhand3d (InterNet)
# ---------------------------------------------------------------------------

def convert_interhand3d_checkpoint(sd, cfg):
    """InterNet .pth -> Interhand3DEstimator variables. Requires the
    reference head layout (config split_hands=True): separate right/left
    Heatmap3DHead deconv stacks + fc root/hand-type heads
    (interhand_3d_head.py:312-315)."""
    if not cfg['model'].get('split_hands'):
        raise ValueError(
            'interhand3d .pth conversion needs the reference InterNet head '
            'layout — set model.split_hands=True (the reference '
            'res50_interhand3d_all_256x256.py builds separate right/left '
            'Heatmap3DHead stacks)')
    bb_p, bb_s = _backbone(sd, cfg)
    cv = Cv(sd, 'keypoint_head.')
    for side in ('right', 'left'):
        t = f'{side}_hand_head.'
        di = 0
        while cv.has(f'{t}deconv_layers.{di * 3}.weight'):
            _deconv(cv, f'{t}deconv_layers.{di * 3}', f'{side}_deconv_{di}')
            cv.bn(f'{t}deconv_layers.{di * 3 + 1}', f'{side}_bn_{di}')
            di += 1
        cv.conv(f'{t}final_layer', f'{side}_final', bias=True)
    cv.linear('root_head.fc.0', 'root_fc1')
    cv.linear('root_head.fc.2', 'root_fc2')
    cv.linear('hand_type_head.fc.0', 'type_fc1')
    cv.linear('hand_type_head.fc.2', 'type_fc2')
    hp, hs = cv.out()
    return {'backbone': _vars(bb_p, bb_s), 'head': _vars(hp, hs)}


# ---------------------------------------------------------------------------
# posewarper
# ---------------------------------------------------------------------------

def _convert_posewarper_neck(sd, prefix='neck.'):
    """PoseWarperNeck (posewarper_neck.py): trans_layer + offset_feats
    BasicBlock chain + per-dilation offset/deform convs."""
    cv = Cv(sd, prefix)
    cv.conv('trans_layer', 'trans_layer', bias=True)
    bi = 0
    while cv.has(f'offset_feats.{bi}.conv1.weight'):
        from .cnn_ckpt import _resnet_block
        _resnet_block(cv, f'offset_feats.{bi}', f'offset_feats_{bi}')
        bi += 1
    j = 0
    while cv.has(f'offset_layers.{j}.weight'):
        cv.conv(f'offset_layers.{j}', f'offset_layers_{j}')
        j += 1
    j = 0
    while cv.has(f'deform_conv_layers.{j}.weight'):
        cv._put(cv.params, (f'deform_conv_{j}',),
                cv.get(f'deform_conv_layers.{j}.weight')
                .transpose(2, 3, 1, 0))
        j += 1
    return cv.out()


def convert_posewarper_checkpoint(sd, cfg):
    """PoseWarper .pth -> variables for models/posewarper.PoseWarper
    (single flax tree with backbone/neck/head scopes).

    The reference stage-2 checkpoint has NO keypoint_head tensors (its
    head is a parameter-less identity, hrnet_w48_..._posewarper_stage2.py
    num_deconv_layers=0 + final_conv_kernel=0) — matching
    build_posewarper's default identity head. A checkpoint that DOES
    carry head tensors needs model.head_overrides set to the matching
    layout, checked here so the mismatch fails with guidance instead of
    a flax missing-param error deep in apply."""
    bb_p, bb_s = _backbone(sd, cfg, default='hrnet')
    nk_p, nk_s = _convert_posewarper_neck(sd)
    hd_p, hd_s = convert_head(sd, prefix='keypoint_head.')
    if hd_p and not cfg['model'].get('head_overrides'):
        raise ValueError(
            'posewarper checkpoint carries keypoint_head tensors '
            f'({sorted(hd_p)}), but the config builds the stage-2 '
            'parameter-less identity head; set model.head_overrides '
            '(deconv_filters/deconv_kernels/final_kernel) to the '
            "checkpoint's head layout")
    return _merge([('backbone', bb_p, bb_s), ('neck', nk_p, nk_s),
                   ('head', hd_p, hd_s)])


# ---------------------------------------------------------------------------
# mesh (HMR)
# ---------------------------------------------------------------------------

def convert_mesh_checkpoint(sd, cfg):
    """ParametricMesh .pth -> {'backbone': vars, 'head': vars}.

    The reference HMRMeshHead (hmr_head.py:28) regresses 24*6 rot6d pose
    with three separate decoders (decpose/decshape/deccam) and mean-param
    buffers; our head fuses the decoders into one Dense and one
    mean_params vector. Requires model.pose_rep='rot6d'."""
    if cfg['model'].get('pose_rep') != 'rot6d':
        raise ValueError(
            "mesh .pth conversion needs model.pose_rep='rot6d' (the "
            'reference HMR head regresses 24*6 rot6d, hmr_head.py:28)')
    bb_p, bb_s = _backbone(sd, cfg)
    p = 'mesh_head.'
    hp = {}
    for fc in ('fc1', 'fc2'):
        hp[fc] = {'kernel': np.asarray(sd[p + fc + '.weight']).T,
                  'bias': np.asarray(sd[p + fc + '.bias'])}
    wk = np.concatenate([np.asarray(sd[p + d + '.weight']).T
                         for d in ('decpose', 'decshape', 'deccam')],
                        axis=1)
    wb = np.concatenate([np.asarray(sd[p + d + '.bias'])
                         for d in ('decpose', 'decshape', 'deccam')])
    hp['out'] = {'kernel': wk, 'bias': wb}
    if p + 'init_pose' in sd:
        hp['mean_params'] = np.concatenate(
            [np.asarray(sd[p + b]).reshape(-1)
             for b in ('init_pose', 'init_shape', 'init_cam')])
    npose = np.asarray(sd[p + 'decpose.bias']).shape[0]
    if npose != 144:
        raise ValueError(f'expected a 24*6 rot6d decpose, got {npose}')
    return {'backbone': _vars(bb_p, bb_s), 'head': {'params': hp}}


# ---------------------------------------------------------------------------
# voxelpose
# ---------------------------------------------------------------------------

def _convert_v2v(sd, prefix):
    """V2VNet (v2v_net.py:212) -> our models/voxelpose.V2VNet names."""
    cv = Cv(sd, prefix)

    def conv3(tname, fpath, bias=True):
        if not cv.has(tname + '.weight'):
            return False
        cv._put(cv.params, tuple(fpath.split('/')) + ('kernel',),
                cv.get(tname + '.weight').transpose(2, 3, 4, 1, 0))
        if cv.has(tname + '.bias'):
            cv._put(cv.params, tuple(fpath.split('/')) + ('bias',),
                    cv.get(tname + '.bias'))
        return True

    def res3d(tname, fname):
        conv3(f'{tname}.res_branch.0.conv', f'{fname}/conv1')
        cv.bn(f'{tname}.res_branch.0.bn', f'{fname}/bn1')
        conv3(f'{tname}.res_branch.1.conv', f'{fname}/conv2')
        cv.bn(f'{tname}.res_branch.1.bn', f'{fname}/bn2')
        conv3(f'{tname}.skip_con.conv', f'{fname}/skip_conv')
        cv.bn(f'{tname}.skip_con.bn', f'{fname}/skip_bn')

    def up3d(tname, fname):
        # ConvTranspose3d [I, O, kd, kh, kw] -> [kd, kh, kw, O, I]
        if cv.has(f'{tname}.block.0.weight'):
            cv._put(cv.params, (fname, 'deconv', 'kernel'),
                    cv.get(f'{tname}.block.0.weight')
                    .transpose(2, 3, 4, 1, 0))
            cv._put(cv.params, (fname, 'deconv', 'bias'),
                    cv.get(f'{tname}.block.0.bias'))
        cv.bn(f'{tname}.block.1', f'{fname}/bn')

    conv3('front_layers.0.block.conv', 'front_basic/conv')
    cv.bn('front_layers.0.block.bn', 'front_basic/bn')
    res3d('front_layers.1', 'front_res')
    ed = 'encoder_decoder.'
    for name in ('skip_res1', 'skip_res2', 'encoder_res1', 'encoder_res2',
                 'mid_res', 'decoder_res1', 'decoder_res2'):
        res3d(ed + name, name)
    up3d(ed + 'decoder_upsample1', 'decoder_upsample1')
    up3d(ed + 'decoder_upsample2', 'decoder_upsample2')
    conv3('output_layer', 'output_layer')
    return cv.out()


def convert_voxelpose_checkpoint(sd, cfg):
    """DetectAndRegress .pth -> {'center': vars, 'pose': vars}
    (models/voxelpose.DetectAndRegress init layout; the optional 2D
    ``backbone.*`` sub-model is evaluated via its own top-down config in
    our pipeline and is ignored here)."""
    c_p, c_s = _convert_v2v(sd, 'human_detector.center_net.')
    p_p, p_s = _convert_v2v(sd, 'pose_regressor.pose_net.')
    if not c_p or not p_p:
        raise ValueError('missing human_detector.center_net.* / '
                         'pose_regressor.pose_net.* tensors')
    return {'center': _vars({'v2v': c_p}, {'v2v': c_s}),
            'pose': _vars({'v2v': p_p}, {'v2v': p_s})}


_FAMILY_CONVERTERS = {
    'bottomup': convert_bottomup_checkpoint,
    'pose_lifter': convert_pose_lifter_checkpoint,
    'interhand3d': convert_interhand3d_checkpoint,
    'posewarper': convert_posewarper_checkpoint,
    'mesh': convert_mesh_checkpoint,
    'voxelpose': convert_voxelpose_checkpoint,
}


def convert_family_checkpoint(path_or_sd, cfg):
    """Reference .pth (path or state dict) + our config -> family-shaped
    flax variables (the tools/test.py CONFIG CHECKPOINT contract for the
    six non-top-down families)."""
    family = cfg['model'].get('family')
    if family not in _FAMILY_CONVERTERS:
        raise KeyError(f'no family converter for {family!r}; '
                       f'available: {sorted(_FAMILY_CONVERTERS)}')
    sd = (load_torch_state_dict(path_or_sd)
          if isinstance(path_or_sd, str) else dict(path_or_sd))
    sd = {k: np.asarray(v) for k, v in sd.items()}
    return _FAMILY_CONVERTERS[family](sd, cfg)

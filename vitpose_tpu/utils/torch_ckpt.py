"""Torch checkpoint ingestion: released ViTPose/MAE .pth -> flax variables.

Reproduces the load-time adaptations of the reference loader
(mmcv_custom/checkpoint.py:312 `load_checkpoint`):
  * accepts {'state_dict' | 'model' | 'module'} containers and strips
    'module.' / MoBY 'encoder.' prefixes;
  * pads/interpolates a 14x14 patch-embed kernel to 16x16;
  * bicubic-regrids pos_embed to the target token grid, preserving the
    cls-token slot (torch F.interpolate is used host-side for bit-parity
    with the reference's resize);
  * splits a pretrained fc2 into shared fc2 + per-expert rows for MoE
    (checkpoint.py:396-404), and the inverse merge for `model_split`.

Conversion happens on host numpy; the result is a flax variables dict
{'params': ..., 'batch_stats': ...} ready for TopDownModel.apply.
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _to_numpy(t):
    if hasattr(t, 'detach'):
        t = t.detach().cpu()
        if str(t.dtype) == 'torch.bfloat16':
            t = t.float()
        return t.numpy()
    return np.asarray(t)


def load_torch_state_dict(path, allow_unsafe=False):
    """Read a .pth file -> flat {name: np.ndarray} with prefixes normalized.

    Uses torch when available; otherwise the pure-python zip/pickle reader
    (utils/pth_reader.py). Loads with ``weights_only=True``; legacy pickles
    that need arbitrary-object unpickling (full code execution on load) are
    refused unless the caller explicitly passes ``allow_unsafe=True`` (or
    sets ``VITPOSE_ALLOW_UNSAFE_CKPT=1`` — the escape hatch for CLI entry
    points that don't thread the flag)."""
    import os
    import pickle as _pickle
    allow_unsafe = allow_unsafe or \
        os.environ.get('VITPOSE_ALLOW_UNSAFE_CKPT', '0') == '1'
    try:
        import torch
        try:
            ckpt = torch.load(path, map_location='cpu', weights_only=True)
        except (_pickle.UnpicklingError, RuntimeError) as e:
            # only pickle-safety refusals reach here; missing files and
            # corrupt archives raise their own error types and propagate
            if not allow_unsafe:
                raise ValueError(
                    f'{path} is not loadable with weights_only=True '
                    f'({e}); loading it would execute arbitrary pickled '
                    'code. Pass allow_unsafe=True (or set '
                    'VITPOSE_ALLOW_UNSAFE_CKPT=1) only for checkpoints '
                    'you trust.') from e
            ckpt = torch.load(path, map_location='cpu', weights_only=False)
    except ImportError:
        from .pth_reader import load_pth
        ckpt = load_pth(path)
    if isinstance(ckpt, dict):
        for key in ('state_dict', 'model', 'module'):
            if key in ckpt:
                ckpt = ckpt[key]
                break
    sd = {k: _to_numpy(v) for k, v in ckpt.items()}
    if all(k.startswith('module.') for k in sd):
        sd = {k[len('module.'):]: v for k, v in sd.items()}
    if sorted(sd.keys())[0].startswith('encoder.'):  # MoBY
        sd = {k[len('encoder.'):]: v for k, v in sd.items()
              if k.startswith('encoder.')}
    return sd


def _interpolate_pos_embed(pos, num_patches, grid_hw):
    """Bicubic-regrid [1, L, C] pos embed to the flax param shape
    [1, num_patches + 1, C] (cls slot + grid); uses torch for exact
    a=-0.75 bicubic parity. Handles cls-bearing, cls-less, and
    distilled (2 prefix tokens) sources — the prefix size is inferred
    as the smallest e in {1, 0, 2} leaving a square source grid."""
    l = pos.shape[1]
    c = pos.shape[-1]
    if l == num_patches + 1:
        return pos
    if l == num_patches:            # cls-less source matching the grid:
        zero_cls = np.zeros((1, 1, c), pos.dtype)
        return np.concatenate([zero_cls, pos], axis=1)
    extra = next((e for e in (1, 0, 2)
                  if int(round((l - e) ** 0.5)) ** 2 == l - e), None)
    if extra is None:
        raise ValueError(
            f'cannot infer a square source grid from pos_embed length {l}')
    cls_tok = (pos[:, :1] if extra
               else np.zeros((1, 1, c), pos.dtype))
    patch_pos = pos[:, extra:]
    side = int(round(patch_pos.shape[1] ** 0.5))
    h, w = grid_hw
    import torch
    import torch.nn.functional as F
    t = torch.from_numpy(np.ascontiguousarray(
        patch_pos.reshape(1, side, side, -1).transpose(0, 3, 1, 2)))
    t = F.interpolate(t, size=(h, w), mode='bicubic', align_corners=False)
    new_patch = t.permute(0, 2, 3, 1).reshape(1, h * w, -1).numpy()
    return np.concatenate([cls_tok, new_patch], axis=1)


def _adapt_patch_embed(kernel, patch_size, mode='pad'):
    """Adapt a conv kernel [D, 3, k, k] to patch_size (reference
    checkpoint.py:360-374 `patch_padding` modes).

    mode='pad' (the reference default) zero-pads asymmetrically
    (padding_l = diff//2, padding_r = diff - padding_l) — e.g. the MAE 14x14
    kernel gets 1px each side to reach 16x16; 'bilinear'/'bicubic'
    interpolate instead. Kernels LARGER than patch_size always interpolate
    (negative padding would crop)."""
    k = kernel.shape[-1]
    if k == patch_size:
        return kernel
    if mode == 'pad' and k < patch_size:
        diff = patch_size - k
        pl = diff // 2
        pr = diff - pl
        return np.pad(kernel, [(0, 0), (0, 0), (pl, pr), (pl, pr)])
    import torch
    import torch.nn.functional as F
    t = torch.from_numpy(kernel)
    t = F.interpolate(t, size=(patch_size, patch_size),
                      mode='bilinear' if mode == 'bilinear' else 'bicubic',
                      align_corners=False)
    return t.numpy()


def split_moe_experts(sd, num_experts, part_dim, depth):
    """Initialize expert weights from a dense pretrained fc2
    (reference checkpoint.py:396-404): each expert gets the LAST `part_dim`
    output rows of fc2; fc2 keeps the rest."""
    sd = dict(sd)
    for i in range(depth):
        wk = f'blocks.{i}.mlp.fc2.weight'
        bk = f'blocks.{i}.mlp.fc2.bias'
        if wk not in sd or sd[wk].shape[0] <= part_dim:
            continue
        w, b = sd[wk], sd[bk]
        for e in range(num_experts):
            sd[f'blocks.{i}.mlp.experts.{e}.weight'] = w[-part_dim:].copy()
            sd[f'blocks.{i}.mlp.experts.{e}.bias'] = b[-part_dim:].copy()
        sd[wk] = w[:-part_dim].copy()
        sd[bk] = b[:-part_dim].copy()
    return sd


def merge_moe_expert(sd, expert_id, depth):
    """Inverse of split: concat expert rows back onto fc2 for a single-task
    checkpoint (reference tools/model_split.py:38-43)."""
    sd = dict(sd)
    for i in range(depth):
        wk = f'backbone.blocks.{i}.mlp.fc2.weight'
        ek = f'backbone.blocks.{i}.mlp.experts.{expert_id}.weight'
        if wk in sd and ek in sd:
            sd[wk] = np.concatenate([sd[wk], sd[ek]], axis=0)
            sd[wk.replace('weight', 'bias')] = np.concatenate(
                [sd[wk.replace("weight", "bias")],
                 sd[ek.replace("weight", "bias")]], axis=0)
    return {k: v for k, v in sd.items() if '.experts.' not in k}


# ---------------------------------------------------------------------------
# name mapping torch -> flax
# ---------------------------------------------------------------------------

def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_backbone(sd, params=None, prefix=''):
    """Map torch ViT(MoE) backbone tensors -> flax param dict (`params`
    is accepted for backward compatibility and ignored)."""
    def g(name):
        return sd.get(prefix + name)

    out = {}
    pe_w = g('patch_embed.proj.weight')
    if pe_w is not None:
        _set(out, ('patch_embed', 'kernel'), pe_w.transpose(2, 3, 1, 0))
        _set(out, ('patch_embed', 'bias'), g('patch_embed.proj.bias'))
    if g('pos_embed') is not None:
        _set(out, ('pos_embed',), g('pos_embed'))

    i = 0
    while g(f'blocks.{i}.norm1.weight') is not None:
        b = f'blocks.{i}.'
        blk = f'blocks_{i}'
        _set(out, (blk, 'norm1', 'scale'), g(b + 'norm1.weight'))
        _set(out, (blk, 'norm1', 'bias'), g(b + 'norm1.bias'))
        _set(out, (blk, 'norm2', 'scale'), g(b + 'norm2.weight'))
        _set(out, (blk, 'norm2', 'bias'), g(b + 'norm2.bias'))
        _set(out, (blk, 'attn', 'qkv', 'kernel'),
             g(b + 'attn.qkv.weight').T)
        if g(b + 'attn.qkv.bias') is not None:
            _set(out, (blk, 'attn', 'qkv', 'bias'), g(b + 'attn.qkv.bias'))
        _set(out, (blk, 'attn', 'proj', 'kernel'),
             g(b + 'attn.proj.weight').T)
        _set(out, (blk, 'attn', 'proj', 'bias'), g(b + 'attn.proj.bias'))
        _set(out, (blk, 'mlp', 'fc1', 'kernel'), g(b + 'mlp.fc1.weight').T)
        _set(out, (blk, 'mlp', 'fc1', 'bias'), g(b + 'mlp.fc1.bias'))
        _set(out, (blk, 'mlp', 'fc2', 'kernel'), g(b + 'mlp.fc2.weight').T)
        _set(out, (blk, 'mlp', 'fc2', 'bias'), g(b + 'mlp.fc2.bias'))
        if g(b + 'mlp.experts.0.weight') is not None:
            e = 0
            ws, bs = [], []
            while g(b + f'mlp.experts.{e}.weight') is not None:
                ws.append(g(b + f'mlp.experts.{e}.weight').T)  # [hidden, part]
                bs.append(g(b + f'mlp.experts.{e}.bias'))
                e += 1
            _set(out, (blk, 'mlp', 'expert_kernel'), np.stack(ws))
            _set(out, (blk, 'mlp', 'expert_bias'), np.stack(bs))
        i += 1

    ln_w = g('last_norm.weight')
    if ln_w is not None:
        _set(out, ('last_norm', 'scale'), ln_w)
        _set(out, ('last_norm', 'bias'), g('last_norm.bias'))
    return out


def convert_head(sd, prefix='keypoint_head.'):
    """Map torch TopdownHeatmapSimpleHead tensors -> (params, batch_stats).
    Also handles the DeepposeRegressionHead layout (a single `fc` Linear,
    deeppose_regression_head.py:40) -> RegressionHead params."""
    def g(name):
        return sd.get(prefix + name)

    params, stats = {}, {}
    if g('fc.weight') is not None:
        _set(params, ('fc', 'kernel'), g('fc.weight').T)
        _set(params, ('fc', 'bias'), g('fc.bias'))
        return params, stats
    # deconv_layers is a Sequential: [deconv, BN, ReLU] * n
    di = 0
    while g(f'deconv_layers.{di * 3}.weight') is not None:
        w = g(f'deconv_layers.{di * 3}.weight')       # [in, out, kh, kw]
        _set(params, (f'deconv_{di}', 'kernel'), w.transpose(2, 3, 1, 0))
        _set(params, (f'bn_{di}', 'scale'),
             g(f'deconv_layers.{di * 3 + 1}.weight'))
        _set(params, (f'bn_{di}', 'bias'),
             g(f'deconv_layers.{di * 3 + 1}.bias'))
        _set(stats, (f'bn_{di}', 'mean'),
             g(f'deconv_layers.{di * 3 + 1}.running_mean'))
        _set(stats, (f'bn_{di}', 'var'),
             g(f'deconv_layers.{di * 3 + 1}.running_var'))
        di += 1
    fw = g('final_layer.weight')                      # [out, in, k, k]
    fb = g('final_layer.bias')
    if fw is None:
        # with extra conv layers (HRNetV2 heads) final_layer is a
        # Sequential [conv, BN, ReLU] * n + final conv (reference
        # topdown_heatmap_simple_head.py extra num_conv_layers branch)
        ci = 0
        while g(f'final_layer.{ci * 3 + 1}.running_mean') is not None:
            w = g(f'final_layer.{ci * 3}.weight')
            _set(params, (f'conv_{ci}', 'kernel'), w.transpose(2, 3, 1, 0))
            _set(params, (f'conv_{ci}', 'bias'),
                 g(f'final_layer.{ci * 3}.bias'))
            _set(params, (f'conv_bn_{ci}', 'scale'),
                 g(f'final_layer.{ci * 3 + 1}.weight'))
            _set(params, (f'conv_bn_{ci}', 'bias'),
                 g(f'final_layer.{ci * 3 + 1}.bias'))
            _set(stats, (f'conv_bn_{ci}', 'mean'),
                 g(f'final_layer.{ci * 3 + 1}.running_mean'))
            _set(stats, (f'conv_bn_{ci}', 'var'),
                 g(f'final_layer.{ci * 3 + 1}.running_var'))
            ci += 1
        fw = g(f'final_layer.{ci * 3}.weight')
        fb = g(f'final_layer.{ci * 3}.bias')
    if fw is not None:
        _set(params, ('final', 'kernel'), fw.transpose(2, 3, 1, 0))
        _set(params, ('final', 'bias'), fb)
    return params, stats


def convert_topdown_checkpoint(path_or_sd, model_cfg, patch_padding='pad',
                               allow_unsafe=False):
    """Full conversion: reference TopDown .pth -> flax variables for
    TopDownModel(model_cfg). Applies pos-embed regrid and patch-kernel
    adaptation for the target input geometry."""
    sd = (load_torch_state_dict(path_or_sd, allow_unsafe=allow_unsafe)
          if isinstance(path_or_sd, str) else dict(path_or_sd))
    bb = model_cfg.backbone

    key = 'backbone.patch_embed.proj.weight'
    if key in sd:
        sd[key] = _adapt_patch_embed(sd[key], bb.patch_size,
                                     mode=patch_padding)
    pk = 'backbone.pos_embed'
    if pk in sd:
        sd[pk] = _interpolate_pos_embed(sd[pk], bb.num_patches, bb.grid)

    params = {'backbone': convert_backbone(sd, None, prefix='backbone.')}
    head_params, head_stats = convert_head(sd, prefix='keypoint_head.')
    params['head'] = head_params
    batch_stats = {'head': head_stats} if head_stats else {}
    for j in range(model_cfg.num_extra_heads):
        hp, hs = convert_head(sd, prefix=f'associate_keypoint_heads.{j}.')
        if hp:
            params[f'extra_head_{j}'] = hp
            batch_stats[f'extra_head_{j}'] = hs
    variables = {'params': params}
    if batch_stats:
        variables['batch_stats'] = batch_stats
    return variables


def convert_backbone_checkpoint(path_or_sd, model_cfg, num_experts=0,
                                part_dim=0, patch_padding='pad',
                                allow_unsafe=False):
    """MAE/pretraining checkpoint (backbone-only keys, no 'backbone.'
    prefix) -> flax backbone params for fine-tuning init."""
    sd = (load_torch_state_dict(path_or_sd, allow_unsafe=allow_unsafe)
          if isinstance(path_or_sd, str) else dict(path_or_sd))
    bb = model_cfg.backbone
    if 'patch_embed.proj.weight' in sd:
        sd['patch_embed.proj.weight'] = _adapt_patch_embed(
            sd['patch_embed.proj.weight'], bb.patch_size,
            mode=patch_padding)
    if 'pos_embed' in sd:
        sd['pos_embed'] = _interpolate_pos_embed(
            sd['pos_embed'], bb.num_patches, bb.grid)
    if num_experts:
        sd = split_moe_experts(sd, num_experts, part_dim, bb.depth)
    return convert_backbone(sd, None, prefix='')

"""Multi-step optimizer-TRAJECTORY parity vs the reference training stack.

Single-backward gradient parity (test_model_parity.py) cannot catch bugs in
the schedule, layer-decay grouping, weight-decay masking, or grad-clip
placement — those only show up over many optimizer steps. This test runs 30
full steps on a converted tiny ViT+head with IDENTICAL batches:

  torch side: AdamW over param groups built with the reference
    `LayerDecayOptimizerConstructor` rules
    (mmcv_custom/layer_decay_optimizer_constructor.py:18 — layer id via
    get_num_layer_for_vit :5, wd-skip for 1-D/bias/pos_embed :42-47,
    lr_scale = rate ** (num_layers - layer_id - 1) :54), global-norm grad
    clip max_norm=1 (configs ViTPose_base_coco_256x192.py
    optimizer_config.grad_clip), and the mmcv StepLrUpdaterHook linear
    warmup + x0.1 step policy (same config :33-38).
  jax side: `layer_decay_adamw` (vitpose_tpu/train/optim.py).

Both trajectories must stay leaf-wise close through warmup AND across a
step-decay boundary.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from vitpose_tpu.models import TopDownModel, make_config
from vitpose_tpu.models.losses import joints_mse_loss
from vitpose_tpu.models.vit import ViTConfig
from vitpose_tpu.train.optim import (OptimConfig, layer_decay_adamw,
                                     make_lr_schedule)
from vitpose_tpu.utils import torch_ckpt as CK

from ref_loader import ref_vit, ref_simple_head

torch.manual_seed(0)

STEPS = 30
STEPS_PER_EPOCH = 10       # decay boundary at step 20 -> inside the run
WARMUP_ITERS = 5           # warmup ends inside the run
BASE_LR = 5e-3             # scaled up so 30 steps move the params visibly
WD = 0.1
RATE = 0.75
DEPTH = 2


def _torch_sd(model, prefix=''):
    return {prefix + k: v.detach().numpy()
            for k, v in model.state_dict().items()}


def _ref_layer_id(name, num_layers):
    """get_num_layer_for_vit, layer_decay_optimizer_constructor.py:5."""
    if name in ("backbone.cls_token", "backbone.mask_token",
                "backbone.pos_embed"):
        return 0
    if name.startswith("backbone.patch_embed"):
        return 0
    if name.startswith("backbone.blocks"):
        return int(name.split('.')[2]) + 1
    return num_layers - 1


def _ref_param_groups(named_params, base_lr, weight_decay, rate, depth):
    """LayerDecayOptimizerConstructor.add_params (:18) group construction."""
    num_layers = depth + 2
    groups = {}
    for name, param in named_params:
        if not param.requires_grad:
            continue
        if len(param.shape) == 1 or name.endswith(".bias") \
                or 'pos_embed' in name:
            gname, wd = "no_decay", 0.
        else:
            gname, wd = "decay", weight_decay
        layer_id = _ref_layer_id(name, num_layers)
        gname = "layer_%d_%s" % (layer_id, gname)
        if gname not in groups:
            scale = rate ** (num_layers - layer_id - 1)
            groups[gname] = {"weight_decay": wd, "params": [],
                             "lr_scale": scale, "lr": scale * base_lr}
        groups[gname]["params"].append(param)
    return list(groups.values())


def _mmcv_step_lr_factor(i, warmup_iters, warmup_ratio, steps_per_epoch,
                         decay_epochs, decay_factor):
    """mmcv LrUpdaterHook: linear warmup over regular_lr, then the step
    policy by epoch boundary (StepLrUpdaterHook.get_lr)."""
    epoch = i // steps_per_epoch
    factor = 1.0
    for e in decay_epochs:
        if epoch >= e:
            factor *= decay_factor
    if i < warmup_iters:
        k = (1 - i / warmup_iters) * (1 - warmup_ratio)
        return factor * (1 - k)
    return factor


@pytest.fixture(scope="module")
def tiny_pair():
    refmod = ref_vit()
    hd = ref_simple_head()
    tv = refmod.ViT(img_size=(64, 48), patch_size=16, embed_dim=32,
                    depth=DEPTH, num_heads=4, qkv_bias=True,
                    drop_path_rate=0.0)
    head = hd.TopdownHeatmapSimpleHead(
        in_channels=32, out_channels=5, num_deconv_layers=2,
        num_deconv_filters=(16, 16), num_deconv_kernels=(4, 4),
        extra=dict(final_conv_kernel=1))
    tv.eval()
    head.eval()
    cfg = make_config('s', img_size=(64, 48), out_channels=5)
    cfg = cfg.__class__(**{**cfg.__dict__,
                           'backbone': ViTConfig(img_size=(64, 48),
                                                 embed_dim=32, depth=DEPTH,
                                                 num_heads=4),
                           'deconv_filters': (16, 16)})
    return tv, head, cfg


def test_optimizer_trajectory_parity(tiny_pair):
    tv, head, cfg = tiny_pair
    ocfg = OptimConfig(base_lr=BASE_LR, weight_decay=WD,
                       layer_decay_rate=RATE, num_layers=DEPTH,
                       warmup_iters=WARMUP_ITERS, warmup_ratio=1e-3,
                       decay_epochs=(2,), decay_factor=0.1,
                       grad_clip_norm=1.0)

    # ---- identical pre-generated batches ----
    rng = np.random.RandomState(11)
    batches = [(rng.randn(2, 3, 64, 48).astype(np.float32),
                rng.rand(2, 5, 16, 12).astype(np.float32),
                (rng.rand(2, 5) > 0.3).astype(np.float32))
               for _ in range(STEPS)]

    init_sd = _torch_sd_init(tv, head)   # snapshot BEFORE torch mutates

    # ---- torch trajectory ----
    named = ([('backbone.' + n, p) for n, p in tv.named_parameters()]
             + [('keypoint_head.' + n, p) for n, p in
                head.named_parameters()])
    groups = _ref_param_groups(named, BASE_LR, WD, RATE, DEPTH)
    opt = torch.optim.AdamW(groups, lr=BASE_LR, betas=(0.9, 0.999),
                            eps=1e-8)
    base_lrs = [g['lr'] for g in opt.param_groups]
    torch_losses = []
    all_params = [p for _, p in named]
    for i, (x, target, weight) in enumerate(batches):
        f = _mmcv_step_lr_factor(i, WARMUP_ITERS, 1e-3, STEPS_PER_EPOCH,
                                 (2,), 0.1)
        for g, b in zip(opt.param_groups, base_lrs):
            g['lr'] = b * f
        opt.zero_grad()
        out = head(tv(torch.from_numpy(x)))
        wt = torch.from_numpy(weight)
        diff = (out - torch.from_numpy(target)) * wt[:, :, None, None]
        loss = (diff ** 2).mean(dim=(0, 2, 3)).sum() / 5
        loss.backward()
        torch.nn.utils.clip_grad_norm_(all_params, max_norm=1.0,
                                       norm_type=2)
        opt.step()
        torch_losses.append(float(loss.detach()))

    # ---- jax trajectory from the SAME initial weights ----
    variables = CK.convert_topdown_checkpoint(init_sd, cfg)
    params = variables['params']
    nonparam = {k: v for k, v in variables.items() if k != 'params'}
    model = TopDownModel(cfg)
    tx = layer_decay_adamw(params, ocfg, steps_per_epoch=STEPS_PER_EPOCH)
    opt_state = tx.init(params)

    def loss_fn(p, xj, tj, wj):
        out = model.apply({**nonparam, 'params': p}, xj, train=False)
        return joints_mse_loss(out, tj, wj)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    @jax.jit
    def apply(p, g, s):
        updates, s = tx.update(g, s, p)
        return optax.apply_updates(p, updates), s

    jax_losses = []
    for x, target, weight in batches:
        xj = jnp.asarray(x.transpose(0, 2, 3, 1))
        loss_j, grads = grad_fn(params, xj, jnp.asarray(target),
                                jnp.asarray(weight))
        params, opt_state = apply(params, grads, opt_state)
        jax_losses.append(float(loss_j))

    # losses computed on pre-update weights each step: step k's loss
    # reflects the whole trajectory up to k-1
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-3,
                               atol=1e-5)

    # ---- final params leaf-wise close ----
    final_sd = _torch_sd_init(tv, head)
    ref_final = CK.convert_topdown_checkpoint(final_sd, cfg)['params']
    import jax.tree_util as jtu
    ref_leaves = dict(jtu.tree_flatten_with_path(ref_final)[0])
    got_leaves = dict(jtu.tree_flatten_with_path(params)[0])
    assert set(ref_leaves) <= set(got_leaves)
    checked = 0
    for path, ref_p in ref_leaves.items():
        got_p = np.asarray(got_leaves[path])
        ref_p = np.asarray(ref_p)
        # Adam-normalized updates: per-step drift is ~1e-3 relative to the
        # update, bounded here relative to the parameter scale after 30
        # steps of lr=5e-3
        np.testing.assert_allclose(got_p, ref_p, rtol=5e-3, atol=2e-4,
                                   err_msg=str(path))
        checked += 1
    assert checked > 20, checked


def _torch_sd_init(tv, head):
    # .copy(): torch .numpy() is a view of the tensor storage, and the
    # optimizer mutates params in place
    sd = {}
    sd.update({('backbone.' + k): v.detach().numpy().copy()
               for k, v in tv.state_dict().items()})
    sd.update({('keypoint_head.' + k): v.detach().numpy().copy()
               for k, v in head.state_dict().items()})
    return sd


def test_schedule_matches_mmcv_formula():
    """The optax schedule equals the mmcv warmup+step factor at every
    iteration, including the warmup boundary and the decay boundary."""
    ocfg = OptimConfig(base_lr=BASE_LR, warmup_iters=WARMUP_ITERS,
                       warmup_ratio=1e-3, decay_epochs=(2,),
                       decay_factor=0.1)
    sched = make_lr_schedule(ocfg, STEPS_PER_EPOCH)
    for i in range(40):
        want = BASE_LR * _mmcv_step_lr_factor(
            i, WARMUP_ITERS, 1e-3, STEPS_PER_EPOCH, (2,), 0.1)
        got = float(sched(i))
        assert abs(got - want) < 1e-9 * max(1.0, abs(want)), (i, got, want)


def test_wd_masking_matches_reference_groups(tiny_pair):
    """The optax wd mask marks exactly the leaves the reference puts in
    'decay' groups (1-D tensors, biases, and pos_embed excluded)."""
    tv, head, cfg = tiny_pair
    from vitpose_tpu.train.optim import _wd_mask_tree, _lr_scale_tree
    sd = _torch_sd_init(tv, head)
    variables = CK.convert_topdown_checkpoint(sd, cfg)
    params = variables['params']
    mask = _wd_mask_tree(params)
    scales = _lr_scale_tree(params, DEPTH, RATE)

    # reference-side classification per torch name
    num_layers = DEPTH + 2
    ref_named = ([('backbone.' + n, p) for n, p in tv.named_parameters()]
                 + [('keypoint_head.' + n, p) for n, p in
                    head.named_parameters()])
    ref_decay = {}
    ref_scale = {}
    for name, p in ref_named:
        decay = not (len(p.shape) == 1 or name.endswith('.bias')
                     or 'pos_embed' in name)
        lid = _ref_layer_id(name, num_layers)
        ref_decay[name] = decay
        ref_scale[name] = RATE ** (num_layers - lid - 1)

    # convert each reference tensor's CLASSIFICATION through the same
    # name mapping by converting an indicator state dict: every leaf of
    # the converted tree inherits the torch tensor's class
    ind_decay = {n: np.full(p.shape, 1.0 if ref_decay[n] else 0.0,
                            np.float32) for n, p in ref_named}
    ind_scale = {n: np.full(p.shape, ref_scale[n], np.float32)
                 for n, p in ref_named}
    conv_decay = CK.convert_topdown_checkpoint(ind_decay, cfg)['params']
    conv_scale = CK.convert_topdown_checkpoint(ind_scale, cfg)['params']

    import jax.tree_util as jtu
    flat_decay = dict(jtu.tree_flatten_with_path(conv_decay)[0])
    flat_scale = dict(jtu.tree_flatten_with_path(conv_scale)[0])
    flat_mask = dict(jtu.tree_flatten_with_path(mask)[0])
    flat_scales = dict(jtu.tree_flatten_with_path(scales)[0])
    checked = 0
    for path, ind in flat_decay.items():
        want = bool(np.asarray(ind).flat[0])
        assert flat_mask[path] == want, (path, want)
        want_s = float(np.asarray(flat_scale[path]).flat[0])
        assert abs(flat_scales[path] - want_s) < 1e-9, (path, want_s)
        checked += 1
    assert checked > 20, checked

"""Numerical parity: flax TopDownModel vs the reference torch modules.

Random-initialized reference torch models are converted through
vitpose_tpu.utils.torch_ckpt and must produce matching outputs — this gates
the entire inference stack (patch embed conv, pos-embed handling, attention,
MLP, deconv head, BN eval stats).
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from vitpose_tpu.models import TopDownModel, make_config
from vitpose_tpu.models.vit import ViT, ViTConfig
from vitpose_tpu.utils import torch_ckpt as CK

from ref_loader import ref_vit, ref_vit_moe, ref_simple_head

torch.manual_seed(0)


def _torch_sd(model, prefix=''):
    return {prefix + k: v.detach().numpy()
            for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def small_vit_pair():
    refmod = ref_vit()
    tv = refmod.ViT(img_size=(64, 48), patch_size=16, embed_dim=32,
                    depth=2, num_heads=4, mlp_ratio=4, qkv_bias=True,
                    drop_path_rate=0.0)
    tv.eval()
    cfg = ViTConfig(img_size=(64, 48), embed_dim=32, depth=2, num_heads=4)
    return tv, cfg


def test_vit_backbone_parity(small_vit_pair):
    tv, cfg = small_vit_pair
    x = np.random.RandomState(0).randn(2, 3, 64, 48).astype(np.float32)
    with torch.no_grad():
        ref = tv(torch.from_numpy(x)).numpy()          # [N, D, Hp, Wp]

    params = CK.convert_backbone(_torch_sd(tv), None, prefix='')
    model = ViT(cfg)
    out = model.apply({'params': params},
                      jnp.asarray(x.transpose(0, 2, 3, 1)),
                      deterministic=True)
    out = np.asarray(out).transpose(0, 3, 1, 2)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_topdown_heatmap_head_parity():
    hd = ref_simple_head()
    head = hd.TopdownHeatmapSimpleHead(
        in_channels=32, out_channels=5, num_deconv_layers=2,
        num_deconv_filters=(16, 16), num_deconv_kernels=(4, 4),
        extra=dict(final_conv_kernel=1))
    head.eval()
    x = np.random.RandomState(1).randn(2, 32, 4, 3).astype(np.float32)
    with torch.no_grad():
        ref = head(torch.from_numpy(x)).numpy()

    sd = _torch_sd(head, prefix='keypoint_head.')
    params, stats = CK.convert_head(sd, prefix='keypoint_head.')

    from vitpose_tpu.models.heads import HeatmapHead
    mod = HeatmapHead(out_channels=5, deconv_filters=(16, 16),
                      deconv_kernels=(4, 4))
    out = mod.apply({'params': params, 'batch_stats': stats},
                    jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_simple_head_parity():
    hd = ref_simple_head()
    head = hd.TopdownHeatmapSimpleHead(
        in_channels=32, out_channels=5, num_deconv_layers=0,
        num_deconv_filters=[], num_deconv_kernels=[],
        upsample=4, extra=dict(final_conv_kernel=3))
    head.eval()
    x = np.random.RandomState(2).randn(2, 32, 4, 3).astype(np.float32)
    with torch.no_grad():
        ref = head(torch.from_numpy(x)).numpy()

    sd = _torch_sd(head, prefix='keypoint_head.')
    params, _ = CK.convert_head(sd, prefix='keypoint_head.')
    from vitpose_tpu.models.heads import SimpleHead
    mod = SimpleHead(out_channels=5, upsample=4)
    out = mod.apply({'params': params},
                    jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_full_topdown_parity():
    """Backbone + head end-to-end through convert_topdown_checkpoint."""
    refmod = ref_vit()
    hd = ref_simple_head()
    tv = refmod.ViT(img_size=(64, 48), patch_size=16, embed_dim=32,
                    depth=2, num_heads=4, qkv_bias=True)
    head = hd.TopdownHeatmapSimpleHead(
        in_channels=32, out_channels=5, num_deconv_layers=2,
        num_deconv_filters=(16, 16), num_deconv_kernels=(4, 4),
        extra=dict(final_conv_kernel=1))
    tv.eval()
    head.eval()
    x = np.random.RandomState(3).randn(2, 3, 64, 48).astype(np.float32)
    with torch.no_grad():
        ref = head(tv(torch.from_numpy(x))).numpy()

    sd = {}
    sd.update(_torch_sd(tv, prefix='backbone.'))
    sd.update(_torch_sd(head, prefix='keypoint_head.'))
    cfg = make_config('s', img_size=(64, 48), out_channels=5)
    cfg = cfg.__class__(**{**cfg.__dict__,
                           'backbone': ViTConfig(img_size=(64, 48),
                                                 embed_dim=32, depth=2,
                                                 num_heads=4),
                           'deconv_filters': (16, 16)})
    variables = CK.convert_topdown_checkpoint(sd, cfg)
    model = TopDownModel(cfg)
    out = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      train=False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_vit_moe_parity():
    refmod = ref_vit_moe()
    tv = refmod.ViTMoE(img_size=(64, 48), patch_size=16, embed_dim=32,
                       depth=2, num_heads=4, qkv_bias=True,
                       num_expert=3, part_features=8)
    tv.eval()
    x = np.random.RandomState(4).randn(4, 3, 64, 48).astype(np.float32)
    idx = np.array([0, 2, 1, 2])
    with torch.no_grad():
        ref = tv(torch.from_numpy(x),
                 torch.from_numpy(idx)).numpy()

    params = CK.convert_backbone(_torch_sd(tv), None, prefix='')
    cfg = ViTConfig(img_size=(64, 48), embed_dim=32, depth=2, num_heads=4,
                    num_experts=3, part_dim=8)
    model = ViT(cfg)
    out = model.apply({'params': params},
                      jnp.asarray(x.transpose(0, 2, 3, 1)),
                      deterministic=True, expert_idx=jnp.asarray(idx))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_moe_split_matches_dense_fc2():
    """After split_moe_experts, expert output must equal the pretrained
    dense fc2's last part_features rows (reference checkpoint.py:396-404)."""
    refmod = ref_vit()
    tv = refmod.ViT(img_size=(64, 48), patch_size=16, embed_dim=32,
                    depth=2, num_heads=4, qkv_bias=True)
    tv.eval()
    sd = _torch_sd(tv)
    sd2 = CK.split_moe_experts(sd, num_experts=3, part_dim=8, depth=2)
    cfg = ViTConfig(img_size=(64, 48), embed_dim=32, depth=2, num_heads=4,
                    num_experts=3, part_dim=8)
    params = CK.convert_backbone(sd2, None, prefix='')
    model = ViT(cfg)
    x = np.random.RandomState(5).randn(2, 3, 64, 48).astype(np.float32)
    with torch.no_grad():
        ref = tv(torch.from_numpy(x)).numpy()
    out = model.apply({'params': params},
                      jnp.asarray(x.transpose(0, 2, 3, 1)),
                      deterministic=True,
                      expert_idx=jnp.zeros(2, jnp.int32))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_training_gradient_parity():
    """Training-step gradient parity: identical weights + inputs + MSE
    targets -> the torch backward and jax.grad agree on EVERY converted
    parameter leaf. Output parity alone cannot catch a gradient-path bug
    (e.g. a stop_gradient or a wrong custom VJP in the fused attention
    kernel); this gates the whole backward stack."""
    refmod = ref_vit()
    hd = ref_simple_head()
    tv = refmod.ViT(img_size=(64, 48), patch_size=16, embed_dim=32,
                    depth=2, num_heads=4, qkv_bias=True,
                    drop_path_rate=0.0)
    head = hd.TopdownHeatmapSimpleHead(
        in_channels=32, out_channels=5, num_deconv_layers=2,
        num_deconv_filters=(16, 16), num_deconv_kernels=(4, 4),
        extra=dict(final_conv_kernel=1))
    # eval-mode BN (fixed running stats) on both sides so the BN grads
    # are the plain affine ones
    tv.eval()
    head.eval()
    rng = np.random.RandomState(7)
    x = rng.randn(2, 3, 64, 48).astype(np.float32)
    target = rng.rand(2, 5, 16, 12).astype(np.float32)
    weight = (rng.rand(2, 5) > 0.3).astype(np.float32)

    xt = torch.from_numpy(x)
    tt = torch.from_numpy(target)
    wt = torch.from_numpy(weight)
    out_t = head(tv(xt))
    diff = (out_t - tt) * wt[:, :, None, None]
    loss_t = (diff ** 2).mean(dim=(0, 2, 3)).sum() / 5
    loss_t.backward()
    grad_sd = {}
    for prefix, mod in (('backbone.', tv), ('keypoint_head.', head)):
        for name, p in mod.named_parameters():
            grad_sd[prefix + name] = p.grad.detach().numpy()

    # the torch->flax conversion is pure layout (transpose/split), so
    # running the GRADIENT state dict through the same converter yields
    # the flax-layout reference gradients
    cfg = make_config('s', img_size=(64, 48), out_channels=5)
    cfg = cfg.__class__(**{**cfg.__dict__,
                           'backbone': ViTConfig(img_size=(64, 48),
                                                 embed_dim=32, depth=2,
                                                 num_heads=4),
                           'deconv_filters': (16, 16)})
    sd = {}
    sd.update(_torch_sd(tv, prefix='backbone.'))
    sd.update(_torch_sd(head, prefix='keypoint_head.'))
    variables = CK.convert_topdown_checkpoint(sd, cfg)
    ref_grads = CK.convert_topdown_checkpoint(grad_sd, cfg)['params']

    import jax
    from vitpose_tpu.models.losses import joints_mse_loss
    model = TopDownModel(cfg)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))

    def loss_fn(params):
        v = dict(variables)
        v = {**v, 'params': params}
        out = model.apply(v, xj, train=False)
        return joints_mse_loss(out, jnp.asarray(target),
                               jnp.asarray(weight))

    loss_j, grads = jax.value_and_grad(loss_fn)(variables['params'])
    assert abs(float(loss_j) - float(loss_t.detach())) < 1e-5

    import jax.tree_util as jtu
    ref_leaves = dict(jtu.tree_flatten_with_path(ref_grads)[0])
    got_leaves = dict(jtu.tree_flatten_with_path(grads)[0])
    # the converter emits only leaves present in the torch model; every
    # one of them must match (pos_embed, patch conv, qkv, mlp, deconv,
    # BN affine, final conv)
    assert set(ref_leaves) <= set(got_leaves)
    checked = 0
    for path, ref_g in ref_leaves.items():
        got_g = np.asarray(got_leaves[path])
        np.testing.assert_allclose(
            got_g, np.asarray(ref_g), rtol=2e-3, atol=1e-5,
            err_msg=str(path))
        checked += 1
    assert checked > 20, checked


def test_moe_gradient_parity():
    """MoE backward parity: the dense-masked reference expert loop
    (vit_moe.py:108-111) and our stacked-expert einsum must produce the
    same gradients — for the shared trunk AND for each expert (only the
    experts selected by `expert_idx` receive nonzero gradient)."""
    refmod = ref_vit_moe()
    tv = refmod.ViTMoE(img_size=(64, 48), patch_size=16, embed_dim=32,
                       depth=2, num_heads=4, qkv_bias=True,
                       num_expert=3, part_features=8, drop_path_rate=0.0)
    tv.eval()
    rng = np.random.RandomState(9)
    x = rng.randn(4, 3, 64, 48).astype(np.float32)
    idx = np.array([0, 2, 1, 2])
    out_t = tv(torch.from_numpy(x), torch.from_numpy(idx))
    loss_t = (out_t ** 2).mean()
    loss_t.backward()
    grad_sd = {name: p.grad.detach().numpy()
               for name, p in tv.named_parameters()}

    params = CK.convert_backbone(_torch_sd(tv), None, prefix='')
    ref_grads = CK.convert_backbone(grad_sd, None, prefix='')
    cfg = ViTConfig(img_size=(64, 48), embed_dim=32, depth=2, num_heads=4,
                    num_experts=3, part_dim=8)
    model = ViT(cfg)

    import jax

    def loss_fn(p):
        out = model.apply({'params': p},
                          jnp.asarray(x.transpose(0, 2, 3, 1)),
                          deterministic=True, expert_idx=jnp.asarray(idx))
        # NHWC here vs torch NCHW: same set of values -> same mean
        return jnp.mean(out.astype(jnp.float32) ** 2)

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    assert abs(float(loss_j) - float(loss_t.detach())) < 1e-6

    import jax.tree_util as jtu
    ref_leaves = dict(jtu.tree_flatten_with_path(ref_grads)[0])
    got_leaves = dict(jtu.tree_flatten_with_path(grads)[0])
    assert set(ref_leaves) <= set(got_leaves)
    for path, ref_g in ref_leaves.items():
        np.testing.assert_allclose(
            np.asarray(got_leaves[path]), np.asarray(ref_g),
            rtol=2e-3, atol=1e-6, err_msg=str(path))

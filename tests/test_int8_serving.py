"""int8 W8A8 serving path: quantized kernels, calibration, accuracy.

The reference deploys via TensorRT (tools/deployment/pytorch2onnx.py);
int8 static-scale quantization is the TPU-native counterpart of TensorRT
int8 calibration. These tests pin (a) Int8Dense == nn.Dense parameter
layout, (b) quantization error bounds, (c) end-to-end decode agreement on
a trained (overfit) model where heatmaps are peaked.
"""
import dataclasses as dc

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_int8_dense_matches_dense_layout_and_value():
    import flax.linen as nn
    from vitpose_tpu.models.vit import Int8Dense

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 64))
    ref = nn.Dense(128)
    v = ref.init(rng, x)
    q = Int8Dense(128, act_scale=None)
    vq = q.init(rng, x)
    # identical parameter trees -> checkpoints interchange
    assert jax.tree.map(lambda a: a.shape, v) == \
        jax.tree.map(lambda a: a.shape, vq)
    y_ref = ref.apply(v, x)
    y_q = q.apply(v, x)          # same variables run through int8
    err = np.abs(np.asarray(y_q - y_ref)).max()
    ref_mag = np.abs(np.asarray(y_ref)).max()
    assert err < 0.05 * ref_mag, (err, ref_mag)


def test_int8_dense_static_scale_close_to_dynamic():
    from vitpose_tpu.models.vit import Int8Dense

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 64))
    amax = float(jnp.max(jnp.abs(x)))
    dyn = Int8Dense(48, act_scale=None)
    v = dyn.init(rng, x)
    stat = Int8Dense(48, act_scale=amax)
    y_d = np.asarray(dyn.apply(v, x))
    y_s = np.asarray(stat.apply(v, x))
    assert np.abs(y_d - y_s).max() < 0.1 * np.abs(y_d).max()


def _tiny_model(int8=False, scales=None):
    from vitpose_tpu.models import TopDownModel, make_config
    cfg = make_config('s', img_size=(64, 64), out_channels=4,
                      dtype='float32', flip_test=False)
    bb = dc.replace(cfg.backbone, embed_dim=48, depth=2, num_heads=4,
                    drop_path_rate=0.0)
    if int8:
        bb = dc.replace(bb, int8_mlp=True,
                        int8_act_scales=tuple(scales) if scales else ())
    return TopDownModel(dc.replace(cfg, backbone=bb))


def test_calibrated_int8_model_heatmaps_close_to_float():
    """Calibration wires per-block static scales and the quantized model's
    heatmaps stay within a few percent of the float path, so a gaussian
    peak (half-width ~1.5 heatmap px, amplitude ~1) cannot move by a
    heatmap pixel under decode."""
    from vitpose_tpu.utils.quantize import calibrate_act_scales

    model = _tiny_model()
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(rng, (4, 64, 64, 3))
    variables = model.init(rng, imgs, train=False)

    scales = calibrate_act_scales(model, variables, [imgs])
    assert len(scales) == 2 and all(len(s) == 2 for s in scales)
    assert all(a1 > 0 and a2 > 0 for a1, a2 in scales)
    q_model = _tiny_model(int8=True, scales=scales)

    hm_b = np.asarray(model.apply(variables, imgs, train=False))
    hm_q = np.asarray(q_model.apply(variables, imgs, train=False))
    rng_span = hm_b.max() - hm_b.min()
    rel = np.abs(hm_q - hm_b).max() / rng_span
    assert rel < 0.05, rel

    # inputs past the calibrated range degrade gracefully (clip, not wrap)
    big = imgs * 50.0
    hm_clip = np.asarray(q_model.apply(variables, big, train=False))
    assert np.isfinite(hm_clip).all()


def test_calibrated_int8_qkv_model_close_to_float():
    """attn=True calibration produces 4-element per-block scales; running
    qkv/proj in int8 on top of the MLPs stays within the same decode-safe
    error envelope."""
    from vitpose_tpu.models import TopDownModel
    from vitpose_tpu.utils.quantize import (calibrate_act_scales,
                                            int8_serving_config)

    model = _tiny_model()
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(rng, (4, 64, 64, 3))
    variables = model.init(rng, imgs, train=False)

    scales = calibrate_act_scales(model, variables, [imgs], attn=True)
    assert len(scales) == 2 and all(len(s) == 4 for s in scales)
    assert all(all(v > 0 for v in s) for s in scales)
    q_model = TopDownModel(int8_serving_config(model.cfg, scales, qkv=True))
    assert q_model.cfg.backbone.int8_qkv

    hm_b = np.asarray(model.apply(variables, imgs, train=False))
    hm_q = np.asarray(q_model.apply(variables, imgs, train=False))
    rel = np.abs(hm_q - hm_b).max() / (hm_b.max() - hm_b.min())
    assert rel < 0.05, rel
    # param tree unchanged -> checkpoints interchange
    vq = q_model.init(rng, imgs, train=False)
    assert jax.tree.map(lambda a: a.shape, variables) == \
        jax.tree.map(lambda a: a.shape, vq)


def test_int8_qkv_requires_attn_scales():
    from vitpose_tpu.utils.quantize import int8_serving_config
    model = _tiny_model()
    with pytest.raises(ValueError):
        int8_serving_config(model.cfg, ((1.0, 2.0), (1.0, 2.0)), qkv=True)


def test_int8_config_roundtrip():
    """int8_serving_config flips only the MLP flags; param tree (and thus
    checkpoints) stay identical between float and int8 serving configs."""
    from vitpose_tpu.utils.quantize import int8_serving_config

    model = _tiny_model()
    cfgq = int8_serving_config(model.cfg, ((1.0, 2.0), (1.0, 2.0)))
    assert cfgq.backbone.int8_mlp
    assert cfgq.backbone.int8_act_scales == ((1.0, 2.0), (1.0, 2.0))
    from vitpose_tpu.models import TopDownModel
    q_model = TopDownModel(cfgq)
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    vq = q_model.init(jax.random.PRNGKey(0), x)
    assert jax.tree.map(lambda a: a.shape, v) == \
        jax.tree.map(lambda a: a.shape, vq)


def test_int8_skip_blocks_selective():
    """int8_skip_blocks keeps the listed blocks bf16: skipping ALL blocks
    must reproduce the float model bitwise; skipping none must not
    (selective quantization, PERF.md sweep; ViTConfig.int8_skip_blocks)."""
    from vitpose_tpu.models import TopDownModel, make_config
    from vitpose_tpu.utils.quantize import first_last_skip

    assert first_last_skip(12, 1, 1) == (0, 11)
    assert first_last_skip(12, 2, 0) == (0, 1)
    assert first_last_skip(12, 0, 0) == ()
    assert first_last_skip(4, 3, 3) == (0, 1, 2, 3)

    cfg = make_config('s', img_size=(64, 64), out_channels=4,
                      dtype='float32', flip_test=False)
    bb = dc.replace(cfg.backbone, embed_dim=48, depth=2, num_heads=4,
                    drop_path_rate=0.0)
    cfg = dc.replace(cfg, backbone=bb)
    model = TopDownModel(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    v = model.init(rng, jnp.zeros((1, 64, 64, 3)))
    y_float = np.asarray(model.apply(v, x, train=False))

    bb8 = dc.replace(bb, int8_mlp=True, int8_qkv=True)
    y_all8 = np.asarray(TopDownModel(dc.replace(cfg, backbone=bb8))
                        .apply(v, x, train=False))
    assert not np.array_equal(y_all8, y_float)

    bb_skip = dc.replace(bb8, int8_skip_blocks=(0, 1))
    y_skip_all = np.asarray(TopDownModel(dc.replace(cfg, backbone=bb_skip))
                            .apply(v, x, train=False))
    np.testing.assert_array_equal(y_skip_all, y_float)

    bb_skip0 = dc.replace(bb8, int8_skip_blocks=(0,))
    y_skip0 = np.asarray(TopDownModel(dc.replace(cfg, backbone=bb_skip0))
                         .apply(v, x, train=False))
    assert not np.array_equal(y_skip0, y_float)
    assert not np.array_equal(y_skip0, y_all8)

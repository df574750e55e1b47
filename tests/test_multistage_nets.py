"""MSPN/RSN/LiteHRNet backbones + MSMU/ViPNAS heads + webcam effects."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_mspn_msmu_pipeline():
    from vitpose_tpu.models.multistage_nets import MSPN
    from vitpose_tpu.models.heads_extra import MSMUHead
    from vitpose_tpu.models.losses import joints_mse_loss
    x = jnp.ones((2, 64, 48, 3))
    bb = MSPN(num_stages=2, unit_channels=32)
    v = bb.init(jax.random.PRNGKey(0), x, train=False)
    feats = bb.apply(v, x, train=False)
    assert len(feats) == 2 and len(feats[0]) == 4
    head = MSMUHead(out_channels=17, num_stages=2, num_units=4)
    hv = head.init(jax.random.PRNGKey(1), feats, train=False)
    outs = head.apply(hv, feats, train=False)
    assert len(outs) == 8
    # the faithful PredictHeatmap resizes EVERY unit to out_shape
    # (reference TopdownHeatmapMSMUHead: all units supervised at the
    # heatmap size); default out_shape = the highest unit resolution
    assert all(o.shape == (2, 17, 16, 12) for o in outs)
    # all units supervisable with the standard loss
    loss = sum(joints_mse_loss(o, jnp.zeros_like(o),
                               jnp.ones(o.shape[:2])) for o in outs)
    assert np.isfinite(float(loss))


def test_rsn_differs_from_mspn():
    from vitpose_tpu.models.multistage_nets import MSPN, RSN
    x = jnp.ones((1, 64, 48, 3))
    rsn = RSN(num_stages=1, unit_channels=32)
    v = rsn.init(jax.random.PRNGKey(0), x, train=False)
    # RSB blocks exist in the param tree
    flat = jax.tree_util.tree_flatten_with_path(v['params'])[0]
    names = {'/'.join(str(k) for k in path) for path, _ in flat}
    assert any('conv_bn_relu2' in n for n in names)    # RSB dense steps


def test_litehrnet():
    from vitpose_tpu.models.multistage_nets import LiteHRNet
    x = jnp.ones((1, 64, 64, 3))
    m = LiteHRNet(num_modules=(1, 1, 1))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    assert m.apply(v, x, train=False).shape == (1, 16, 16, 40)


def test_vipnas_head_grouped():
    from vitpose_tpu.models.heads_extra import ViPNASHead
    h = ViPNASHead(out_channels=17, deconv_filters=(32,),
                   deconv_groups=(4,))
    x = jnp.ones((1, 8, 6, 64))
    v = h.init(jax.random.PRNGKey(0), x, train=False)
    assert h.apply(v, x, train=False).shape == (1, 16, 12, 17)
    # grouped: 4 separate deconv kernels
    assert 'deconv_0_3' in v['params']


def test_webcam_effect_nodes():
    import dataclasses as dc
    from vitpose_tpu.api import init_pose_model
    from vitpose_tpu.api.webcam import EffectNode
    from vitpose_tpu.models import make_config
    from vitpose_tpu.models.vit import ViTConfig
    cfg = make_config('s', img_size=(64, 48), out_channels=17)
    cfg = dc.replace(cfg, backbone=ViTConfig(img_size=(64, 48),
                                             embed_dim=32, depth=1,
                                             num_heads=4))
    model = init_pose_model(cfg)
    kp = np.zeros((17, 3), np.float32)
    kp[1] = [30, 20, 0.9]
    kp[2] = [50, 20, 0.9]
    for kind in ('sunglasses', 'bugeye'):
        node = EffectNode(model, kind=kind)
        # gradient frame: magnification must visibly move pixels
        frame = np.tile(np.arange(100, dtype=np.uint8)[:, None, None],
                        (1, 100, 3))
        out = node.process(dict(frame=frame.copy(),
                                pose_results=[dict(keypoints=kp)]))
        assert (out['vis_frame'] != frame).any(), kind


def test_multistage_estimator_train_step():
    """GenericMultiStageTopDown trains through make_train_step: list
    outputs -> per-stage loss sum (lower-res units vs resized target)."""
    import optax
    from vitpose_tpu.models.topdown import (GenericMultiStageTopDown,
                                            make_config)
    from vitpose_tpu.models.multistage_nets import MSPN
    from vitpose_tpu.train.step import make_train_step
    from vitpose_tpu.train.state import create_train_state

    cfg = make_config('s', img_size=(64, 48), head='msmu', out_channels=4,
                      num_stages=1, num_units=4, flip_test=False)
    model = GenericMultiStageTopDown(
        backbone=MSPN(num_stages=1, num_units=4, unit_channels=16,
                      res_top_channels=16), cfg=cfg)
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(rng, (2, 64, 48, 3))
    variables = model.init(rng, imgs, train=True)
    outs = model.apply(variables, imgs, train=True,
                       rngs={'droppath': rng},
                       mutable=['batch_stats'])[0]
    assert isinstance(outs, list) and len(outs) == 4
    assert outs[-1].shape == (2, 4, 16, 12)

    state = create_train_state(model, rng, imgs, optax.adam(1e-3))
    step = jax.jit(make_train_step(model))
    batch = {'imgs': imgs,
             'target': jnp.zeros((2, 4, 16, 12)),
             'target_weight': jnp.ones((2, 4))}
    l0 = None
    for i in range(5):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        if l0 is None:
            l0 = float(metrics['heatmap_loss'])
    assert float(metrics['heatmap_loss']) < l0

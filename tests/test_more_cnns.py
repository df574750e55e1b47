"""Remaining CNN backbone family smoke tests."""
import jax
import jax.numpy as jnp
import pytest

from vitpose_tpu.models.more_cnns import (SCNet, ResNeSt, RegNet,
                                          MobileNetV3, ShuffleNetV1)


@pytest.mark.parametrize("name,factory,channels", [
    ("scnet", lambda: SCNet(50), 2048),
    ("resnest", lambda: ResNeSt(50), 2048),
    ("regnet", lambda: RegNet(stage_depths=(1, 1, 2, 1)), 1360),
    ("mobilenetv3", MobileNetV3, 576),
    ("shufflenetv1", lambda: ShuffleNetV1(groups=3), 960),
])
def test_backbone_forward(name, factory, channels):
    m = factory()
    x = jnp.ones((1, 64, 48, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 2, 2, channels)
    # train-mode (BN updating) path also works
    out2, _ = m.apply(v, x, train=True, mutable=['batch_stats'])
    assert out2.shape == out.shape


def test_vipnas_mbv3():
    from vitpose_tpu.models.more_cnns import ViPNASMobileNetV3
    m = ViPNASMobileNetV3()
    x = jnp.ones((1, 64, 48, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 2, 2, 160)

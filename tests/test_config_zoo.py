"""Config-zoo sweep: every shipped config must load and build its model
(counterpart of reference tests/test_config.py)."""
import glob
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(
    os.path.join(REPO, 'vitpose_tpu', 'configs', '**', '*.py'),
    recursive=True))
CONFIGS = [c for c in CONFIGS if '/base/' not in c]


@pytest.mark.parametrize('path', CONFIGS, ids=[os.path.basename(c)
                                               for c in CONFIGS])
def test_config_builds(path):
    from vitpose_tpu.utils.config import load_config
    from vitpose_tpu.train.loop import build_model_from_cfg
    cfg = load_config(path)
    assert 'model' in cfg and 'data' in cfg and 'optimizer' in cfg
    model = build_model_from_cfg(cfg['model'])
    family = cfg['model'].get('family', 'topdown')
    if family == 'topdown':
        # building the model object must succeed and expose a valid config
        assert model.cfg.out_channels > 0
        if 'num_extra_heads' in cfg['model']:
            assert model.cfg.num_extra_heads == \
                cfg['model']['num_extra_heads']
    else:
        assert model is not None
        if family == 'bottomup':
            assert model.num_joints == cfg['model'].get('num_joints', 17)


CNN_CONFIGS = [c for c in CONFIGS
               if any(k in os.path.basename(c) for k in
                      ('hrnet', 'litehrnet', 'hrformer', 'res50', 'res101',
                       'res152', 'resnext', 'seresnext', 'seresnet',
                       'resnetv1d', 'scnet', 'vipnas', 'mobilenetv2',
                       'shufflenetv1', 'shufflenetv2', 'resnest', 'vgg',
                       'alexnet', 'cpm', 'hourglass', 'mspn', 'rsn'))]


@pytest.mark.parametrize('path', CNN_CONFIGS,
                         ids=[os.path.basename(c) for c in CNN_CONFIGS])
def test_cnn_config_forwards(path):
    """Generic-topdown configs must actually run a tiny forward."""
    import jax
    import jax.numpy as jnp
    from vitpose_tpu.utils.config import load_config
    from vitpose_tpu.train.loop import build_model_from_cfg
    cfg = load_config(path)
    if cfg['model'].get('family', 'topdown') != 'topdown':
        pytest.skip('non-topdown families have their own e2e tests '
                    '(test_bottomup_training, test_mesh, ...)')
    mcfg = dict(cfg['model'])
    mcfg['img_size'] = (64, 64)
    mcfg['dtype'] = 'float32'
    if 'backbone_overrides' in mcfg:
        bo = dict(mcfg['backbone_overrides'])
        bo.pop('dtype', None)
        # shrink staged backbones for the smoke forward
        if mcfg.get('backbone_type') in ('hrnet', 'hrnetv2', 'hrformer'):
            bo['stage_modules'] = (1, 1, 1)
        if mcfg.get('backbone_type') == 'litehrnet':
            bo['num_modules'] = (1, 1, 1)
        if mcfg.get('backbone_type') == 'hourglass':
            # 64px smoke input only fits 2 hourglass downsamples
            bo['downsample_times'] = 2
            # first stage must stay 256ch to match the hard-coded stem
            bo['stage_channels'] = (256, 64, 96)
            bo['stage_blocks'] = (1, 1, 1)
        if mcfg.get('backbone_type') in ('mspn', 'rsn'):
            bo['unit_channels'] = 32
        mcfg['backbone_overrides'] = bo
    model = build_model_from_cfg(mcfg)
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(v, x, train=False)
    if cfg['model'].get('head') == 'regression':
        assert out.ndim == 3 and out.shape[2] == 2   # [N, K, 2] coords
    else:
        assert out.ndim == 4
    assert out.shape[1] == cfg['model']['out_channels']

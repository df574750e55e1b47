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
    # building the model object must succeed and expose a valid backbone
    assert model.cfg.backbone.depth > 0
    assert model.cfg.out_channels > 0
    if 'num_extra_heads' in cfg['model']:
        assert model.cfg.num_extra_heads == cfg['model']['num_extra_heads']

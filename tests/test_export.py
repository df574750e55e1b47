"""Deployment export round-trip (counterpart of reference tests/test_onnx.py
— export + runtime parity): StableHLO serialize -> deserialize -> identical
heatmaps."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_stablehlo_roundtrip(tmp_path):
    import dataclasses as dc
    from vitpose_tpu.models import TopDownModel, make_config, infer
    from vitpose_tpu.data import DatasetInfo

    cfg = make_config('s', img_size=(64, 48), out_channels=17,
                      flip_test=True)
    cfg = dc.replace(cfg, backbone=dc.replace(cfg.backbone, embed_dim=32,
                                              depth=2, num_heads=4))
    model = TopDownModel(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, 64, 48, 3))
    variables = model.init(rng, x, train=False)
    fi = DatasetInfo.load('coco').flip_index

    def fwd(imgs):
        return infer(model, variables, imgs, flip_index=fi)

    exported = jax.export.export(jax.jit(fwd))(
        jax.ShapeDtypeStruct((2, 64, 48, 3), jnp.float32))
    blob = exported.serialize()
    path = tmp_path / 'model.stablehlo'
    path.write_bytes(blob)

    restored = jax.export.deserialize(path.read_bytes())
    out_ref = np.asarray(fwd(x))
    out_rt = np.asarray(restored.call(x))
    np.testing.assert_allclose(out_rt, out_ref, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_export_cli(tmp_path):
    """The export CLI end-to-end (StableHLO with its built-in parity
    check; counterpart of pytorch2onnx's onnxruntime verification)."""
    import os
    import subprocess
    import sys
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    out = subprocess.run(
        [sys.executable, 'tools/deployment/export.py',
         'vitpose_tpu/configs/coco/vitpose_s_coco_256x192.py',
         '--out', str(tmp_path / 'm.stablehlo'), '--batch', '1'],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    assert (tmp_path / 'm.stablehlo').exists()

#!/usr/bin/env python
"""Model export for deployment (counterpart of reference
tools/deployment/pytorch2onnx.py — ONNX export + runtime parity check).

Two formats:
  * StableHLO via jax.export — portable serialized artifact, reloadable
    with jax.export.deserialize (the JAX-native interchange format).
  * TF SavedModel via jax2tf — servable by TF-Serving/TFLite toolchains.

Both paths run a numerical parity check against the JAX model, like the
reference's onnxruntime verification.

Usage:
  python tools/deployment/export.py CONFIG [--checkpoint x.pth|x.npz]
      --out model.stablehlo [--format stablehlo|savedmodel] [--batch 1]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

if os.environ.get('JAX_PLATFORMS'):
    import jax
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('config')
    ap.add_argument('--checkpoint', default=None)
    ap.add_argument('--out', required=True)
    ap.add_argument('--format', default='stablehlo',
                    choices=['stablehlo', 'savedmodel'])
    ap.add_argument('--batch', type=int, default=1)
    ap.add_argument('--no-flip', action='store_true')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from vitpose_tpu.utils.config import load_config
    from vitpose_tpu.train.loop import build_model_from_cfg
    from vitpose_tpu.models import infer
    from vitpose_tpu.data import DatasetInfo

    cfg = load_config(args.config)
    model = build_model_from_cfg(cfg['model'])
    ih, iw = model.cfg.backbone.img_size
    rng = jax.random.PRNGKey(0)
    if args.checkpoint:
        from tools.test import load_variables
        # route CNN-zoo checkpoints through their converters, exactly
        # like tools/test.py (a .pth for hrnet etc. would otherwise hit
        # the ViT converter)
        variables = load_variables(
            args.checkpoint, model.cfg,
            backbone_type=cfg['model'].get('backbone_type', 'vit'),
            num_units=cfg['model'].get('num_units', 4),
            use_prm=cfg['model'].get('use_prm', False))
    else:
        variables = model.init(rng, jnp.zeros((1, ih, iw, 3)))
    fi = None if args.no_flip else DatasetInfo.load(
        cfg['data'].get('dataset', 'coco')).flip_index

    def fwd(imgs):
        return infer(model, variables, imgs, flip_index=fi)

    x = jax.random.normal(rng, (args.batch, ih, iw, 3), jnp.float32)
    ref = np.asarray(jax.jit(fwd)(x))

    if args.format == 'stablehlo':
        from jax import export as jexport
        exported = jexport.export(jax.jit(fwd))(
            jax.ShapeDtypeStruct(x.shape, x.dtype))
        blob = exported.serialize()
        with open(args.out, 'wb') as f:
            f.write(blob)
        # parity check through deserialize + call
        reloaded = jexport.deserialize(blob)
        out = np.asarray(reloaded.call(x))
        err = np.abs(out - ref).max()
        print(f'wrote {args.out} ({len(blob)/1e6:.1f} MB), '
              f'reload parity max err {err:.2e}')
    else:
        from jax.experimental import jax2tf
        import tensorflow as tf
        tf_fn = tf.function(
            jax2tf.convert(fwd, with_gradient=False),
            autograph=False,
            input_signature=[tf.TensorSpec((args.batch, ih, iw, 3),
                                           tf.float32)])
        module = tf.Module()
        module.serve = tf_fn
        tf.saved_model.save(module, args.out)
        out = np.asarray(tf_fn(tf.constant(np.asarray(x))))
        err = np.abs(out - ref).max()
        print(f'wrote SavedModel to {args.out}, parity max err {err:.2e}')


if __name__ == '__main__':
    main()

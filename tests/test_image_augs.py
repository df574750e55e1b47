"""Image-level augmentation suite: native CoarseDropout/GridDropout
counterparts, the photometric loader wiring, and the AdaptiveWing heatmap
training criterion (reference config variants
hrnet_w32_coco_256x192_{coarsedropout,gridmask,photometric}.py and
res50_coco_256x192_awing.py)."""
import numpy as np
import pytest

REF = "/root/reference/tests/data/coco"


def test_coarse_dropout_bounds():
    from vitpose_tpu.data.pipeline import coarse_dropout
    rng = np.random.RandomState(0)
    img = np.full((128, 96, 3), 200, np.uint8)
    out = coarse_dropout(rng, img, p=1.0, fill_value=0)
    assert out is not img and (img == 200).all()      # input untouched
    holes = (out == 0).all(-1)
    assert holes.any()
    # hole area bounded by max_holes * max_h * max_w
    assert holes.sum() <= 8 * 40 * 40
    # p=0 -> no-op (returns the input unchanged)
    same = coarse_dropout(np.random.RandomState(1), img, p=0.0)
    np.testing.assert_array_equal(same, img)


def test_grid_dropout_pattern():
    from vitpose_tpu.data.pipeline import grid_dropout
    rng = np.random.RandomState(3)
    img = np.full((120, 120, 3), 77, np.uint8)
    out = grid_dropout(rng, img, p=1.0)
    holes = (out == 0).all(-1)
    assert holes.any()
    # grid: hole rows repeat with the unit period -> the row projection
    # has at least ceil(120/unit_max) distinct hole bands
    assert holes.any(1).sum() >= 120 // 40 * 5  # >= n_bands * min hole


def test_photometric_loader_wiring():
    """aug.photometric=True must change the training canvases and keep
    the val path and the geometry stream untouched."""
    from vitpose_tpu.data import TopDownDataset
    from vitpose_tpu.data.loader import TopDownLoader
    from vitpose_tpu.data.pipeline import AugmentConfig
    ds = TopDownDataset(f"{REF}/test_coco.json", REF + "/",
                        dataset_info='coco')
    plain = next(iter(TopDownLoader(ds, batch_size=4, is_train=True,
                                    canvas_size=320, num_workers=1,
                                    seed=0)))
    auged = next(iter(TopDownLoader(ds, batch_size=4, is_train=True,
                                    canvas_size=320, num_workers=1, seed=0,
                                    aug=AugmentConfig(photometric=True))))
    assert not np.array_equal(plain['imgs'], auged['imgs'])
    # deterministic under the same seed
    auged2 = next(iter(TopDownLoader(ds, batch_size=4, is_train=True,
                                     canvas_size=320, num_workers=1, seed=0,
                                     aug=AugmentConfig(photometric=True))))
    np.testing.assert_array_equal(auged['imgs'], auged2['imgs'])
    # eval loader ignores image augs
    v1 = next(iter(TopDownLoader(ds, batch_size=4, is_train=False,
                                 canvas_size=320, num_workers=1, seed=0)))
    v2 = next(iter(TopDownLoader(ds, batch_size=4, is_train=False,
                                 canvas_size=320, num_workers=1, seed=0,
                                 aug=AugmentConfig(photometric=True))))
    np.testing.assert_array_equal(v1['imgs'], v2['imgs'])


def test_dropout_loader_wiring():
    from vitpose_tpu.data import TopDownDataset
    from vitpose_tpu.data.loader import TopDownLoader
    from vitpose_tpu.data.pipeline import AugmentConfig
    ds = TopDownDataset(f"{REF}/test_coco.json", REF + "/",
                        dataset_info='coco')
    aug = AugmentConfig(coarse_dropout=dict(p=1.0, max_holes=8,
                                            max_height=40, max_width=40))
    b = next(iter(TopDownLoader(ds, batch_size=4, is_train=True,
                                canvas_size=320, num_workers=1, seed=0,
                                aug=aug)))
    plain = next(iter(TopDownLoader(ds, batch_size=4, is_train=True,
                                    canvas_size=320, num_workers=1,
                                    seed=0)))
    # some previously-nonzero pixels must have been zeroed
    assert ((plain['imgs'] != 0) & (b['imgs'] == 0)).any()


def test_awing_train_step_runs_and_matches_loss():
    """heatmap_loss='awing' trains against adaptive_wing_loss (already
    golden-tested vs the reference in test_targets3d_and_training)."""
    import jax
    import jax.numpy as jnp
    from vitpose_tpu.train.loop import build_model_from_cfg
    from vitpose_tpu.train.step import make_train_step
    from vitpose_tpu.train.state import TrainState
    from vitpose_tpu.models.losses import adaptive_wing_loss
    import optax

    mcfg = dict(backbone_type='resnet', backbone_overrides=dict(depth=18),
                img_size=(64, 64), out_channels=4, head='heatmap',
                deconv_filters=(8,), deconv_kernels=(4,), dtype='float32',
                flip_test=False, heatmap_loss='awing')
    model = build_model_from_cfg(mcfg)
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(rng, (2, 64, 64, 3))
    variables = model.init(rng, jnp.zeros((2, 64, 64, 3)), train=True)
    tx = optax.adam(1e-3)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables['params'],
                       batch_stats=variables.get('batch_stats', {}),
                       opt_state=tx.init(variables['params']), tx=tx)
    step = make_train_step(model, heatmap_loss='awing')
    target = jax.random.uniform(rng, (2, 4, 4, 4))
    tw = jnp.ones((2, 4))
    batch = dict(imgs=imgs, target=target, target_weight=tw)
    new_state, metrics = step(state, batch, rng)
    # the reported loss IS the adaptive wing loss of the forward output
    out = model.apply({'params': state.params,
                       'batch_stats': state.batch_stats},
                      imgs, train=True,
                      rngs={'dropout': rng},
                      mutable=['batch_stats'])[0]
    expect = adaptive_wing_loss(out, target, tw)
    np.testing.assert_allclose(float(metrics['heatmap_loss']),
                               float(expect), rtol=1e-4)

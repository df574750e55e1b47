"""Bottom-up AE training smoke: loss decreases on the real fixture."""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

REF = "/root/reference/tests/data/coco"


@pytest.mark.slow
def test_bottomup_training_converges():
    from vitpose_tpu.data.bottomup import BottomUpCocoDataset
    from vitpose_tpu.data import DatasetInfo
    from vitpose_tpu.models.bottomup import BottomUpEstimator
    from vitpose_tpu.models.vit import ViTConfig
    from vitpose_tpu.train.bottomup_loop import (BottomUpLoader,
                                                 make_bottomup_train_step)

    ds = BottomUpCocoDataset(f"{REF}/test_coco.json", REF + "/",
                             input_size=128, output_sizes=(32,),
                             max_people=10)
    ds.info = DatasetInfo.load('coco')
    loader = BottomUpLoader(ds, batch_size=4, output_size=32, sigma=1.5)

    bb = ViTConfig(img_size=(128, 128), embed_dim=48, depth=2, num_heads=4)
    est = BottomUpEstimator(bb, num_joints=17,
                            dataset_info=DatasetInfo.load('coco'))
    from vitpose_tpu.train.bottomup_loop import split_bottomup_variables
    rng = jax.random.PRNGKey(0)
    variables = est.init(rng, jnp.zeros((1, 128, 128, 3)))
    params, batch_stats = split_bottomup_variables(variables)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    stats0 = jax.tree.leaves(batch_stats)

    loss_fn, train_step = make_bottomup_train_step(est)
    step = jax.jit(functools.partial(train_step, tx=tx))

    losses = []
    for epoch in range(10):
        loader.set_epoch(epoch)
        for batch in loader:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            params, batch_stats, opt_state, metrics = step(
                params, batch_stats, opt_state, batch)
            losses.append(float(metrics['total_loss']))
    # BN running stats were collected by training, not gradient-updated
    stats1 = jax.tree.leaves(batch_stats)
    assert len(stats0) == len(stats1)
    if stats0:
        assert any(not np.allclose(a, b)
                   for a, b in zip(stats0, stats1)), \
            'batch_stats never updated in train mode'
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    # all three loss components present
    assert {'heatmap_loss', 'push_loss', 'pull_loss'} <= set(metrics)


@pytest.mark.slow
def test_train_model_dispatches_bottomup_config(tmp_path):
    """family='bottomup' configs train through train_model (config ->
    HigherHRNet-style estimator -> AE losses), smoke on the fixture."""
    from vitpose_tpu.utils.config import load_config
    from vitpose_tpu.train.loop import train_model

    cfg = load_config('vitpose_tpu/configs/coco/'
                      'higherhrnet_w32_coco_512x512.py')
    cfg['model']['backbone_overrides'] = dict(width=8,
                                              stage_modules=(1, 1, 1),
                                              stage_blocks=1)
    cfg['model']['head_overrides'] = dict(num_basic_blocks=1,
                                          deconv_filters=(8,),
                                          deconv_kernels=(4,),
                                          cat_output=(True,),
                                          with_ae_loss=(True, False))
    cfg['data']['train'] = dict(ann_file=f"{REF}/test_coco.json",
                                img_prefix=REF + "/")
    cfg['data'].update(input_size=128, output_sizes=(32,), batch_size=2,
                       max_people=10)
    cfg['optimizer']['total_epochs'] = 1
    variables = train_model(cfg, work_dir=str(tmp_path), max_steps=2)
    assert variables is not None
    assert (tmp_path / 'latest.npz').exists()


def test_multistage_bottomup_training_loss_layout():
    """AEMultiStageHead (Hourglass-AE) outputs must reach the training
    loss in NHWC like every other AE head: finite loss, all components,
    and a gradient that actually flows (guards the NCHW-vs-NHWC layout
    regression found in review)."""
    from vitpose_tpu.data.bottomup import BottomUpCocoDataset
    from vitpose_tpu.data import DatasetInfo
    from vitpose_tpu.models.bottomup import BottomUpEstimator
    from vitpose_tpu.models.lightweight import HourglassAE
    from vitpose_tpu.models.heads_extra import AEMultiStageHead
    from vitpose_tpu.train.bottomup_loop import (
        BottomUpLoader, make_bottomup_train_step, split_bottomup_variables)

    ds = BottomUpCocoDataset(f"{REF}/test_coco.json", REF + "/",
                             input_size=64, output_sizes=(16,),
                             max_people=10)
    ds.info = DatasetInfo.load('coco')
    loader = BottomUpLoader(ds, batch_size=2, output_size=16, sigma=1.5)

    bb = HourglassAE(downsample_times=2, num_stacks=2, out_channels=34,
                     stage_channels=(16, 24, 32), feat_channels=16)
    head = AEMultiStageHead(out_channels=34, num_stages=2,
                            num_deconv_layers=0, deconv_filters=(),
                            deconv_kernels=(), final_kernel=0)
    est = BottomUpEstimator(bb, num_joints=17, head=head,
                            dataset_info=DatasetInfo.load('coco'))
    rng = jax.random.PRNGKey(0)
    variables = est.init(rng, jnp.zeros((1, 64, 64, 3)))
    params, batch_stats = split_bottomup_variables(variables)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    _, train_step = make_bottomup_train_step(est)
    step = jax.jit(functools.partial(train_step, tx=tx))
    batch = next(iter(loader))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    p0 = jax.tree.leaves(params)
    params, batch_stats, opt_state, metrics = step(
        params, batch_stats, opt_state, batch)
    assert np.isfinite(float(metrics['total_loss']))
    assert {'heatmap_loss', 'push_loss', 'pull_loss'} <= set(metrics)
    p1 = jax.tree.leaves(params)
    assert any(not np.allclose(a, b) for a, b in zip(p0, p1))

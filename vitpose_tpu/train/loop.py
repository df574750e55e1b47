"""End-to-end training orchestration (the runner).

Replaces the reference's mmcv `EpochBasedRunner` + hook zoo
(reference: apis/train.py:60 `train_model`, runner hooks at train.py:172-194)
with one explicit loop: epochs -> host loader -> device preprocess ->
sharded train step, plus json-lines logging, periodic COCO evaluation,
orbax checkpointing with best-metric tracking, and resume.
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np

from ..data import TopDownDataset, topdown_dataset_cls
from ..data.loader import TopDownLoader
from ..data.pipeline import AugmentConfig, make_preprocess_fn
from ..models import TopDownModel, make_config
from ..eval.loop import run_validation
from ..utils.checkpoint import CheckpointManager
from .optim import OptimConfig, layer_decay_adamw
from .state import create_train_state
from .step import make_train_step
from ..parallel import make_mesh, shard_train_step


_tb_writers = {}


def _log(work_dir, record, tensorboard=False):
    # host writes are rank-0 only: in a multi-host run every process would
    # otherwise append to the same train.log.json on a shared filesystem
    import jax
    if jax.process_index() != 0:
        return
    line = json.dumps(record)
    print(line, flush=True)
    if work_dir:
        with open(os.path.join(work_dir, 'train.log.json'), 'a') as f:
            f.write(line + '\n')
        if tensorboard:
            _log_tensorboard(work_dir, record)


def _log_tensorboard(work_dir, record):
    """Optional TF summary writer (the reference's TensorboardLoggerHook
    counterpart, default_runtime.py:7)."""
    try:
        import tensorflow as tf
    except ImportError:
        return
    if work_dir not in _tb_writers:
        _tb_writers[work_dir] = tf.summary.create_file_writer(
            os.path.join(work_dir, 'tb'))
    step = record.get('step', record.get('epoch', 0))
    with _tb_writers[work_dir].as_default():
        for k, v in record.items():
            if isinstance(v, (int, float)) and k not in ('epoch', 'iter',
                                                         'step'):
                tf.summary.scalar(f"{record.get('mode', 'x')}/{k}", v,
                                  step=step)


def _pop_freeze_options(ocfg_d: dict):
    """Extract the backbone-freezing keys from an optimizer config dict
    (reference vit.py:249 `_freeze_stages` options, exposed via config as
    optimizer.frozen_stages / freeze_attn / freeze_ffn)."""
    return dict(frozen_stages=ocfg_d.pop('frozen_stages', -1),
                freeze_attn=ocfg_d.pop('freeze_attn', False),
                freeze_ffn=ocfg_d.pop('freeze_ffn', False))


def _apply_freeze(tx, init_params, freeze_kw):
    if freeze_kw['frozen_stages'] < 0 and not freeze_kw['freeze_attn'] \
            and not freeze_kw['freeze_ffn']:
        return tx
    from .optim import make_freeze_mask, freeze_tx
    return freeze_tx(tx, make_freeze_mask(init_params, **freeze_kw))


def build_model_from_cfg(mcfg: dict):
    mcfg = dict(mcfg)
    family = mcfg.pop('family', 'topdown')
    if family != 'topdown':
        return build_family_model(family, mcfg)
    backbone_type = mcfg.pop('backbone_type', 'vit')
    variant = mcfg.pop('variant', 'b')
    wh = mcfg.pop('img_size', (256, 192))
    bb_over = mcfg.pop('backbone_overrides', None)
    if backbone_type == 'vit':
        cfg = make_config(variant, img_size=tuple(wh), **mcfg)
        if bb_over:
            import dataclasses as _dc
            cfg = _dc.replace(cfg,
                              backbone=_dc.replace(cfg.backbone, **bb_over))
        return TopDownModel(cfg)
    return build_generic_topdown(backbone_type, tuple(wh), bb_over or {},
                                 mcfg)


def build_backbone(backbone_type: str, **bb_kwargs):
    """Name -> NHWC feature backbone module (the registry shared by
    every model family; counterpart of the reference BACKBONES registry,
    models/builder.py:6)."""
    def _hrnet(**kw):
        from ..models.hrnet import HRNet, HRNetConfig
        return HRNet(HRNetConfig(**kw))

    from ..models.resnet import ResNet, ResNetV1d
    from ..models.resnext import ResNeXt, SEResNeXt
    from ..models.more_cnns import (SCNet, ResNeSt, RegNet, MobileNetV3,
                                    ShuffleNetV1, ViPNASMobileNetV3,
                                    ViPNASResNet)
    from ..models.multistage_nets import LiteHRNet, MSPN, RSN
    from ..models.hrformer import HRFormer
    from ..models.classic_cnns import SEResNet, VGG, AlexNet, CPM
    from ..models.lightweight import (MobileNetV2, ShuffleNetV2, Hourglass,
                                      HourglassAE)
    def _hrnetv2(**kw):
        from ..models.hrnet import HRNet, HRNetConfig
        return HRNet(HRNetConfig(multiscale_concat=True, **kw))

    registry = {
        'hrnet': _hrnet,
        'hrnetv2': _hrnetv2,
        'resnet': ResNet,
        'resnet_v1d': ResNetV1d,
        'resnext': ResNeXt,
        'seresnet': SEResNet,
        'seresnext': SEResNeXt,
        'scnet': SCNet,
        'resnest': ResNeSt,
        'regnet': RegNet,
        'vgg': VGG,
        'alexnet': AlexNet,
        'mobilenet_v2': MobileNetV2,
        'mobilenet_v3': MobileNetV3,
        'shufflenet_v1': ShuffleNetV1,
        'shufflenet_v2': ShuffleNetV2,
        'litehrnet': LiteHRNet,
        'hrformer': HRFormer,
        'vipnas_mbv3': ViPNASMobileNetV3,
        'vipnas_resnet': ViPNASResNet,
        # multi-stage families (paired with GenericMultiStageTopDown)
        'cpm': CPM,
        'hourglass': Hourglass,
        'hourglass_ae': HourglassAE,
        'mspn': MSPN,
        'rsn': RSN,
    }
    if backbone_type not in registry:
        raise KeyError(f'unknown backbone_type {backbone_type}: '
                       f'{sorted(registry)}')
    return registry[backbone_type](**bb_kwargs)


def build_family_model(family: str, mcfg: dict):
    """Non-top-down model families from config (reference equivalents:
    AssociativeEmbedding, PoseLifter, ParametricMesh detectors built by
    build_posenet, models/builder.py:36)."""
    mcfg = dict(mcfg)
    if family == 'bottomup':
        from ..models.bottomup import BottomUpEstimator
        from ..models.heads_extra import (AEHead, AEHigherResolutionHead,
                                          AEMultiStageHead)
        from ..data.dataset_info import DatasetInfo
        bb = build_backbone(mcfg.pop('backbone_type', 'hrnet'),
                            **(mcfg.pop('backbone_overrides', None) or {}))
        num_joints = mcfg.pop('num_joints', 17)
        head_kind = mcfg.pop('head', 'ae')
        head_kw = mcfg.pop('head_overrides', None) or {}
        if head_kind == 'ae_higher':
            head = AEHigherResolutionHead(num_joints, **head_kw)
        elif head_kind == 'ae_multi':
            # Hourglass-AE style: the backbone emits per-stack prediction
            # maps; the head is per-stage identity/deconv
            head = AEMultiStageHead(**head_kw)
        else:
            head = AEHead(num_joints, **head_kw)
        info = DatasetInfo.load(mcfg.pop('dataset_info', 'coco'))
        return BottomUpEstimator(bb, num_joints=num_joints, head=head,
                                 dataset_info=info,
                                 parser_cfg=mcfg.pop('parser', None))
    if family == 'pose_lifter':
        from ..models.pose3d import PoseLifter
        # protocol knobs consumed by the training loop / eval, not the
        # module (SimpleBaseline3D: root-removed MSE targets)
        mcfg.pop('remove_root', None)
        mcfg.pop('loss', None)
        return PoseLifter(**mcfg)
    if family == 'mesh':
        from ..models.mesh import build_parametric_mesh
        return build_parametric_mesh(mcfg)
    if family == 'posewarper':
        from ..models.posewarper import build_posewarper
        return build_posewarper(mcfg)
    if family == 'interhand3d':
        from ..models.interhand3d import Interhand3DEstimator
        backbone_type = mcfg.pop('backbone_type', 'vit')
        bb_over = mcfg.pop('backbone_overrides', None) or {}
        if backbone_type == 'vit':
            from ..models.vit import ViTConfig
            return Interhand3DEstimator(
                backbone_cfg=ViTConfig(**bb_over), **mcfg)
        bb = build_backbone(backbone_type, **bb_over)
        return Interhand3DEstimator(backbone=bb,
                                    backbone_mode_kwarg='train', **mcfg)
    if family == 'voxelpose':
        from ..models.voxelpose import DetectAndRegress
        # loop-level knobs, not model-ctor args
        mcfg.pop('root_id', None)
        mcfg.pop('max_people_train', None)
        return DetectAndRegress(**mcfg)
    raise KeyError(f'unknown model family {family!r}; expected topdown, '
                   'bottomup, pose_lifter, mesh, posewarper, '
                   'interhand3d, or voxelpose')


def build_generic_topdown(backbone_type: str, img_size, bb_kwargs: dict,
                          mcfg: dict):
    """CNN-backbone top-down estimators (HRNet/LiteHRNet/HRFormer/
    ResNe(X)t/SCNet/ViPNAS...)."""
    import dataclasses as _dc
    from ..models.topdown import GenericTopDown, TopDownConfig

    backbone = build_backbone(backbone_type, **bb_kwargs)
    cfg = make_config('s', img_size=img_size, **mcfg)
    # the ViT sub-config is a placeholder on the generic path (only its
    # dtype field is consulted, for the head)
    if cfg.head_type in ('multistage', 'msmu', 'identity'):
        from ..models.topdown import GenericMultiStageTopDown
        return GenericMultiStageTopDown(backbone=backbone, cfg=cfg)
    return GenericTopDown(backbone=backbone, cfg=cfg)


def train_model(cfg: dict, work_dir: Optional[str] = None,
                resume: bool = False, max_steps: Optional[int] = None):
    """Train from a config dict (see vitpose_tpu/configs/). Returns final
    state. `max_steps` truncates for smoke tests. A list-valued
    cfg['data']['train'] dispatches to the ViTPose+ multi-dataset path."""
    import jax
    import jax.numpy as jnp

    family = cfg['model'].get('family', 'topdown')
    if family == 'bottomup':
        from .bottomup_loop import train_bottomup_model
        return train_bottomup_model(cfg, work_dir=work_dir, resume=resume,
                                    max_steps=max_steps)
    if family == 'interhand3d':
        from .interhand_loop import train_interhand3d_model
        return train_interhand3d_model(cfg, work_dir=work_dir,
                                       resume=resume, max_steps=max_steps)
    if family == 'voxelpose':
        from .voxelpose_loop import train_voxelpose_model
        return train_voxelpose_model(cfg, work_dir=work_dir,
                                     resume=resume, max_steps=max_steps)
    if family == 'mesh':
        from .mesh_loop import train_mesh_model
        return train_mesh_model(cfg, work_dir=work_dir, resume=resume,
                                max_steps=max_steps)
    if family == 'pose_lifter':
        from .lifter_loop import train_pose_lifter_model
        return train_pose_lifter_model(cfg, work_dir=work_dir,
                                       resume=resume, max_steps=max_steps)
    if family == 'posewarper':
        from .posewarper_loop import train_posewarper_model
        return train_posewarper_model(cfg, work_dir=work_dir,
                                      resume=resume, max_steps=max_steps)
    if family != 'topdown':
        raise NotImplementedError(
            f'unknown model family {family!r}; train_model handles '
            'topdown, bottomup, interhand3d, voxelpose, mesh, '
            'posewarper, and pose_lifter configs')
    if isinstance(cfg['data'].get('train'), (list, tuple)):
        return train_model_moe(cfg, work_dir=work_dir, resume=resume,
                               max_steps=max_steps)

    work_dir = work_dir or cfg.get('runtime', {}).get('work_dir', 'work_dir')
    os.makedirs(work_dir, exist_ok=True)
    rt = cfg.get('runtime', {})
    seed = rt.get('seed', 0)
    rng = jax.random.PRNGKey(seed)

    # ---- data -------------------------------------------------------
    dcfg = cfg['data']
    image_size = tuple(dcfg.get('image_size', (192, 256)))
    heatmap_size = tuple(dcfg.get('heatmap_size', (48, 64)))
    ds_name = dcfg.get('dataset', 'coco')
    train_ds = topdown_dataset_cls(ds_name)(
        dcfg['train']['ann_file'], dcfg['train']['img_prefix'],
        dataset_info=ds_name,
        image_size=image_size, heatmap_size=heatmap_size,
        use_gt_bbox=dcfg['train'].get('use_gt_bbox', True))
    n_proc = jax.process_count()
    loader = TopDownLoader(
        train_ds, dcfg.get('batch_size', 64), is_train=True,
        canvas_size=dcfg.get('canvas_size'),
        padding=dcfg.get('padding', 1.25),
        aug=AugmentConfig(**dcfg.get('aug', {})),
        seed=seed, num_workers=dcfg.get('num_workers', 8),
        process_index=jax.process_index(), process_count=n_proc)

    tcfg = cfg.get('target', {})
    target_type = cfg['model'].get('target_type', 'GaussianHeatmap')
    preprocess = make_preprocess_fn(
        image_size=image_size, heatmap_size=heatmap_size,
        use_udp=tcfg.get('encoding', 'UDP') == 'UDP',
        sigma=tcfg.get('sigma', 2.0),
        unbiased=tcfg.get('unbiased', False),
        target_type=target_type)

    # ---- model + optimizer -----------------------------------------
    model = build_model_from_cfg(cfg['model'])
    ocfg_d = dict(cfg.get('optimizer', {}))
    total_epochs = ocfg_d.pop('total_epochs', 210)
    freeze_kw = _pop_freeze_options(ocfg_d)
    ocfg = OptimConfig(num_layers=model.cfg.backbone.depth, **ocfg_d)
    steps_per_epoch = max(1, len(loader))

    sample = next(iter(loader))
    pre0 = preprocess(sample['imgs'], sample['center'], sample['scale'],
                      sample['rot'], sample['joints'], sample['vis'],
                      sample.get('flip'))
    init_vars = model.init(rng, pre0['imgs'], train=False)
    init_params = init_vars['params']

    if cfg.get('pretrained'):
        from ..utils.torch_ckpt import convert_backbone_checkpoint
        bb = convert_backbone_checkpoint(cfg['pretrained'], model.cfg,
                                         num_experts=model.cfg.backbone
                                         .num_experts,
                                         part_dim=model.cfg.backbone
                                         .part_dim)
        merged = dict(init_params)
        merged['backbone'] = _merge_trees(init_params['backbone'], bb)
        init_params = merged

    if cfg.get('load_from'):
        # reference `load_from`: initialize the FULL model (backbone +
        # head) from a previous checkpoint before finetuning (mmcv
        # runner.load_checkpoint; the fork's SyntheticPose finetune
        # configs rely on this, e.g. ViTPose_small_combo_finetune_*).
        from ..api.inference import load_checkpoint_variables
        lv = load_checkpoint_variables(cfg['load_from'], cfg['model'],
                                       topdown_cfg=model.cfg)
        init_params = _merge_trees_checked(init_params, lv['params'])
        if 'batch_stats' in lv:
            init_vars = dict(init_vars)
            init_vars['batch_stats'] = _merge_trees_checked(
                dict(init_vars.get('batch_stats', {})), lv['batch_stats'])

    tx = layer_decay_adamw(init_params, ocfg, steps_per_epoch)
    tx = _apply_freeze(tx, init_params, freeze_kw)
    state = create_train_state(model, rng, pre0['imgs'], tx,
                               variables=init_vars)
    state = state.replace(params=jax.tree.map(jnp.asarray, init_params))

    # ---- mesh -------------------------------------------------------
    import math
    n_dev = jax.device_count()
    batch_size = dcfg.get('batch_size', 64)
    # the data axis must divide the per-step batch
    n_data = rt.get('n_data') or math.gcd(batch_size, n_dev)
    mesh = make_mesh(n_data=n_data, n_expert=1,
                     devices=jax.devices()[:n_data])
    step_fn = make_train_step(
        model, target_type=target_type,
        reg_loss=cfg['model'].get('reg_loss', 'smooth_l1'),
        heatmap_loss=cfg['model'].get('heatmap_loss', 'mse'))
    batch0 = {'imgs': pre0['imgs'], 'target': pre0['target'],
              'target_weight': pre0['target_weight']}
    jitted, state, place_batch = shard_train_step(step_fn, mesh, state,
                                                  batch0,
                                                  zero1=rt.get('zero1',
                                                               False))

    # ---- checkpointing / resume ------------------------------------
    save_best = (rt.get('save_best')
                 or cfg.get('evaluation', {}).get('save_best', 'AP'))
    ckpt = CheckpointManager(os.path.join(work_dir, 'ckpts'),
                             save_best_metric=save_best)
    start_epoch = 0
    if resume:
        state, ep = ckpt.restore(state)
        if ep is not None:
            start_epoch = ep + 1
            info = ckpt.load_info(ep)
            if info and info.get('meta', {}).get('completed') is False:
                start_epoch = ep    # preempted mid-epoch: redo that epoch
            _log(work_dir, {'mode': 'resume', 'epoch': start_epoch})

    # ---- val loader -------------------------------------------------
    val_loader = None
    if 'val' in dcfg:
        val_name = dcfg.get('dataset', 'coco')
        val_ds = topdown_dataset_cls(val_name)(
            dcfg['val']['ann_file'], dcfg['val']['img_prefix'],
            dataset_info=val_name,
            image_size=image_size, heatmap_size=heatmap_size,
            test_mode=True,
            use_gt_bbox=dcfg['val'].get('use_gt_bbox', True),
            bbox_file=dcfg['val'].get('bbox_file'))
        val_loader = TopDownLoader(
            val_ds, dcfg.get('val_batch_size', dcfg.get('batch_size', 64)),
            is_train=False, canvas_size=dcfg.get('canvas_size'),
        padding=dcfg.get('padding', 1.25),
            num_workers=dcfg.get('num_workers', 8))

    log_interval = rt.get('log_interval', 50)
    eval_interval = cfg.get('evaluation', {}).get(
        'interval', rt.get('eval_interval', 10))
    ckpt_interval = rt.get('ckpt_interval', 10)
    use_tb = rt.get('tensorboard', False)
    mcfg = model.cfg
    # resume continues the optimizer-step counter so the per-step RNG
    # streams (fold_in below) don't replay from zero
    global_step = int(state.step)
    from ..parallel.distributed import PreemptionGuard
    guard = PreemptionGuard().install()

    for epoch in range(start_epoch, total_epochs):
        loader.set_epoch(epoch)
        t_epoch = time.time()
        t_data = 0.0
        t_last = time.time()
        for it, batch in enumerate(loader):
            t_data += time.time() - t_last
            pre = preprocess(batch['imgs'], batch['center'], batch['scale'],
                             batch['rot'], batch['joints'], batch['vis'],
                             batch.get('flip'))
            dev_batch = place_batch({'imgs': pre['imgs'],
                                     'target': pre['target'],
                                     'target_weight': pre['target_weight']})
            state, metrics = jitted(state, dev_batch,
                                    jax.random.fold_in(rng, global_step))
            global_step += 1
            if it % log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                _log(work_dir, dict(mode='train', epoch=epoch, iter=it,
                                    step=global_step, data_time=t_data,
                                    time=time.time() - t_epoch, **m),
                     tensorboard=use_tb)
            t_last = time.time()
            if guard.should_stop:
                _log(work_dir, {'mode': 'preempt', 'epoch': epoch,
                                'step': global_step})
                # mid-epoch save: mark incomplete so resume redoes this
                # epoch instead of skipping its remaining iterations
                ckpt.save(epoch, state, meta={'completed': False})
                return state
            if max_steps and global_step >= max_steps:
                return state
        record = dict(mode='epoch', epoch=epoch,
                      epoch_time=time.time() - t_epoch)

        stats = None
        if val_loader is not None and eval_interval \
                and (epoch + 1) % eval_interval == 0:
            variables = {'params': state.params}
            if state.batch_stats:
                variables['batch_stats'] = state.batch_stats
            results = run_validation(
                model, variables, val_loader,
                use_udp=mcfg.use_udp, post_process=mcfg.post_process,
                modulate_kernel=mcfg.modulate_kernel,
                target_type=mcfg.target_type)
            eval_metric = cfg.get('evaluation', {}).get('metric')
            stats = (val_loader.ds.evaluate(results, metric=eval_metric)
                     if eval_metric else val_loader.ds.evaluate(results))
            record.update({k: float(v) for k, v in stats.items()})
        _log(work_dir, record, tensorboard=use_tb)

        if (ckpt_interval and (epoch + 1) % ckpt_interval == 0) \
                or epoch == total_epochs - 1:
            ckpt.save(epoch, state, metrics=stats)
    return state


def _merge_trees(base, override):
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge_trees(out[k], v)
        else:
            out[k] = v
    return out


def _merge_trees_checked(base, override, path=''):
    """Non-strict checkpoint merge: leaves whose shape doesn't match the
    model are kept at their fresh init (the reference mmcv
    load_checkpoint(strict=False) behavior that `load_from` relies on,
    e.g. finetuning a 133-kpt head from a 17-kpt body checkpoint)."""
    out = dict(base)
    for k, v in override.items():
        here = f'{path}/{k}'
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge_trees_checked(out[k], v, here)
        elif k in out and isinstance(v, dict) != isinstance(out[k], dict):
            # structural mismatch (dict on one side, array on the other):
            # keep the fresh init rather than corrupting the param tree
            print(f'load_from: skipping {here} (structure mismatch)',
                  flush=True)
        elif k in out and getattr(out[k], 'shape', None) is not None \
                and getattr(v, 'shape', None) is not None \
                and tuple(out[k].shape) != tuple(v.shape):
            print(f'load_from: skipping {here} '
                  f'(ckpt {tuple(v.shape)} != model {tuple(out[k].shape)})',
                  flush=True)
        elif k not in out:
            print(f'load_from: skipping unexpected key {here}', flush=True)
        else:
            out[k] = v
    return out


def train_model_moe(cfg: dict, work_dir: Optional[str] = None,
                    resume: bool = False, max_steps: Optional[int] = None):
    """ViTPose+ multi-dataset MoE training.

    cfg['data']['train'] is a LIST of dataset dicts (each with its own
    `dataset`, `ann_file`, `img_prefix`, `dataset_idx`). Batches are
    homogeneous per dataset (static shapes; the per-head loss masking of
    make_moe_train_step reproduces the reference's per-sample masking
    semantics, reference top_down_moe.py:166-203). Experts shard over the
    mesh `expert` axis when device count allows.
    """
    import math
    import jax
    import jax.numpy as jnp
    from .step import make_moe_train_step
    from ..data.loader import MultiDatasetLoader

    work_dir = work_dir or cfg.get('runtime', {}).get('work_dir', 'work_dir')
    os.makedirs(work_dir, exist_ok=True)
    rt = cfg.get('runtime', {})
    seed = rt.get('seed', 0)
    rng = jax.random.PRNGKey(seed)

    dcfg = cfg['data']
    image_size = tuple(dcfg.get('image_size', (192, 256)))
    heatmap_size = tuple(dcfg.get('heatmap_size', (48, 64)))
    max_k = dcfg.get('max_num_joints', 133)
    tcfg = cfg.get('target', {})

    # one preprocess fn for every dataset entry: image/heatmap size and
    # target encoding are shared across the mixture (targets are padded to
    # max_num_joints), and indexing per-dataset fns by the configured
    # dataset_idx value would break for non-positional idx values
    preprocess = make_preprocess_fn(
        image_size=image_size, heatmap_size=heatmap_size,
        use_udp=tcfg.get('encoding', 'UDP') == 'UDP',
        sigma=tcfg.get('sigma', 2.0), pad_num_joints=max_k)
    datasets, loaders = [], []
    for i, entry in enumerate(dcfg['train']):
        ds = topdown_dataset_cls(entry.get('dataset', 'coco'))(
            entry['ann_file'], entry['img_prefix'],
            dataset_info=entry.get('dataset', 'coco'),
            image_size=image_size, heatmap_size=heatmap_size,
            use_gt_bbox=entry.get('use_gt_bbox', True),
            dataset_idx=entry.get('dataset_idx', i),
            max_num_joints=max_k)
        loader = TopDownLoader(
            ds, dcfg.get('batch_size', 64), is_train=True,
            canvas_size=dcfg.get('canvas_size'),
        padding=dcfg.get('padding', 1.25),
            aug=AugmentConfig(**dcfg.get('aug', {})),
            seed=seed + i, num_workers=dcfg.get('num_workers', 8),
            process_index=jax.process_index(),
            process_count=jax.process_count())
        datasets.append(ds)
        loaders.append(loader)
    mixture = MultiDatasetLoader(loaders)
    num_datasets = len(datasets)

    # ---- model ------------------------------------------------------
    model = build_model_from_cfg(cfg['model'])
    assert model.cfg.num_extra_heads == num_datasets - 1, \
        'need one associate head per extra dataset'
    ocfg_d = dict(cfg.get('optimizer', {}))
    total_epochs = ocfg_d.pop('total_epochs', 210)
    freeze_kw = _pop_freeze_options(ocfg_d)
    ocfg = OptimConfig(num_layers=model.cfg.backbone.depth, **ocfg_d)
    steps_per_epoch = max(1, len(mixture))

    b0 = next(iter(loaders[0]))
    pre0 = preprocess(b0['imgs'], b0['center'], b0['scale'], b0['rot'],
                      b0['joints'], b0['vis'], b0.get('flip'))
    n0 = pre0['imgs'].shape[0]
    init_expert = jnp.zeros(n0, jnp.int32)
    init_vars = model.init(rng, pre0['imgs'], train=False,
                           all_heads=True, expert_idx=init_expert)
    init_params = init_vars['params']
    if cfg.get('pretrained'):
        from ..utils.torch_ckpt import convert_backbone_checkpoint
        bb = convert_backbone_checkpoint(
            cfg['pretrained'], model.cfg,
            num_experts=model.cfg.backbone.num_experts,
            part_dim=model.cfg.backbone.part_dim)
        init_params = dict(init_params,
                           backbone=_merge_trees(init_params['backbone'],
                                                 bb))
    tx = layer_decay_adamw(init_params, ocfg, steps_per_epoch)
    tx = _apply_freeze(tx, init_params, freeze_kw)
    state = create_train_state(model, rng, pre0['imgs'], tx,
                               expert_idx=init_expert, variables=init_vars)
    state = state.replace(params=jax.tree.map(jnp.asarray, init_params))

    n_dev = jax.device_count()
    batch_size = dcfg.get('batch_size', 64)
    n_expert_axis = rt.get('n_expert', 1)
    n_data = rt.get('n_data') or math.gcd(batch_size,
                                          n_dev // n_expert_axis)
    mesh = make_mesh(n_data=n_data, n_expert=n_expert_axis,
                     devices=jax.devices()[:n_data * n_expert_axis])
    step_fn = make_moe_train_step(model, num_datasets)
    batch0 = {'imgs': pre0['imgs'], 'target': pre0['target'],
              'target_weight': pre0['target_weight'],
              'dataset_idx': jnp.asarray(b0['dataset_idx'])}
    jitted, state, place_batch = shard_train_step(step_fn, mesh, state,
                                                  batch0,
                                                  zero1=rt.get('zero1',
                                                               False))

    save_best = (rt.get('save_best')
                 or cfg.get('evaluation', {}).get('save_best', 'AP'))
    ckpt = CheckpointManager(os.path.join(work_dir, 'ckpts'),
                             save_best_metric=save_best)
    start_epoch = 0
    if resume:
        state, ep = ckpt.restore(state)
        if ep is not None:
            start_epoch = ep + 1
            _log(work_dir, {'mode': 'resume', 'epoch': start_epoch})

    val_loader = None
    if 'val' in dcfg:
        vcfg = dcfg['val']
        val_ds = topdown_dataset_cls(vcfg.get('dataset', 'coco'))(
            vcfg['ann_file'], vcfg['img_prefix'],
            dataset_info=vcfg.get('dataset', 'coco'),
            image_size=image_size, heatmap_size=heatmap_size,
            test_mode=True, use_gt_bbox=vcfg.get('use_gt_bbox', True),
            bbox_file=vcfg.get('bbox_file'))
        val_loader = TopDownLoader(
            val_ds, dcfg.get('val_batch_size', batch_size),
            is_train=False, canvas_size=dcfg.get('canvas_size'),
        padding=dcfg.get('padding', 1.25),
            num_workers=dcfg.get('num_workers', 8))

    log_interval = rt.get('log_interval', 50)
    eval_interval = cfg.get('evaluation', {}).get(
        'interval', rt.get('eval_interval', 10))
    ckpt_interval = rt.get('ckpt_interval', 10)
    mcfg = model.cfg
    # resume continues the optimizer-step counter so the per-step RNG
    # streams (fold_in below) don't replay from zero
    global_step = int(state.step)

    for epoch in range(start_epoch, total_epochs):
        for l in loaders:
            l.set_epoch(epoch)
        mixture.set_epoch(epoch)
        t_epoch = time.time()
        for it, batch in enumerate(mixture):
            d = int(batch['dataset_idx'][0])
            pre = preprocess(batch['imgs'], batch['center'],
                             batch['scale'], batch['rot'],
                             batch['joints'], batch['vis'],
                             batch.get('flip'))
            dev_batch = place_batch({
                'imgs': pre['imgs'], 'target': pre['target'],
                'target_weight': pre['target_weight'],
                'dataset_idx': jnp.asarray(batch['dataset_idx'])})
            state, metrics = jitted(state, dev_batch,
                                    jax.random.fold_in(rng, global_step))
            global_step += 1
            if it % log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                _log(work_dir, dict(mode='train', epoch=epoch, iter=it,
                                    dataset=d, step=global_step, **m))
            if max_steps and global_step >= max_steps:
                return state
        record = dict(mode='epoch', epoch=epoch,
                      epoch_time=time.time() - t_epoch)
        stats = None
        if val_loader is not None and eval_interval \
                and (epoch + 1) % eval_interval == 0:
            variables = {'params': state.params}
            if state.batch_stats:
                variables['batch_stats'] = state.batch_stats
            results = run_validation(
                model, variables, val_loader, use_udp=mcfg.use_udp,
                post_process=mcfg.post_process,
                modulate_kernel=mcfg.modulate_kernel, expert_idx=0,
                head_idx=0)
            stats = val_loader.ds.evaluate(results)
            record.update({k: float(v) for k, v in stats.items()})
        _log(work_dir, record)
        if (ckpt_interval and (epoch + 1) % ckpt_interval == 0) \
                or epoch == total_epochs - 1:
            ckpt.save(epoch, state, metrics=stats)
    return state

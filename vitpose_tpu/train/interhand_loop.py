"""InterHand3D training: loader + jitted step + loop.

Counterpart of the reference InterNet training path
(configs/hand/3d_kpt_sview_rgb_img/internet/interhand3d/
res50_interhand3d_all_256x256.py: TopDownAffine crop ->
Generate3DHeatmapTarget + HandGenerateRelDepthTarget + hand-type targets
-> Interhand3DHead.get_loss). TPU-first shape: the host prepares static
[N, H, W, 3] crops and the full target group per batch; one jit step runs
forward + the three losses + the optimizer update.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..data.interhand import InterHandDataset, training_targets
from ..ops.geometry import (affine_matrix, apply_affine_to_points,
                            bbox_xywh2cs)


class InterHandLoader:
    """Batches of (imgs, hm3d, hm_weight, rel_root mm, root weight,
    hand_type, type weight) from an InterHandDataset."""

    def __init__(self, dataset: InterHandDataset, batch_size,
                 image_size=(256, 256), heatmap_size=(64, 64, 64),
                 depth_bound=400.0, root_depth_bins=64,
                 root_depth_bound=400.0, sigma=2.5, seed=0, is_train=True):
        self.ds = dataset
        self.batch_size = batch_size
        self.image_size = tuple(image_size)
        self.heatmap_size = tuple(heatmap_size)
        self.depth_bound = depth_bound
        self.root_depth_bins = root_depth_bins
        self.root_depth_bound = root_depth_bound
        self.sigma = sigma
        self.seed = seed
        self.is_train = is_train
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __len__(self):
        return max(1, len(self.ds.db) // self.batch_size)

    def _prepare(self, rec, rng=None):
        import cv2
        w, h = self.image_size
        img = cv2.imread(rec['image_file'])
        if img is None:                      # fixture sets without images
            img = np.zeros((256, 256, 3), np.uint8)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        center, scale = bbox_xywh2cs(rec['bbox'], aspect_ratio=w / h)
        center = np.asarray(center, np.float32).copy()
        scale = np.asarray(scale, np.float32).copy()
        rec2 = dict(rec)
        joints = np.asarray(rec['joints_3d'], np.float32).copy()
        vis = np.asarray(rec['joints_3d_visible'], np.float32).copy()
        rot = 0.0
        if rng is not None:
            # reference interhand3d train pipeline
            # (res50_interhand3d_all_256x256.py:75-84):
            # HandRandomFlip(0.5): source mirror + joint pair swap +
            # hand_type swap + rel_root_depth negation
            if rng.rand() < 0.5:
                img = img[:, ::-1].copy()
                width = img.shape[1]
                fi = self.ds.info.flip_index
                joints = joints[fi]
                vis = vis[fi]
                joints[:, 0] = width - 1 - joints[:, 0]
                center[0] = width - 1 - center[0]
                ht = np.asarray(rec['hand_type'], np.float32)
                rec2['hand_type'] = ht[::-1].copy()
                rec2['rel_root_depth'] = -rec['rel_root_depth']
            # TopDownRandomTranslation(trans_factor=0.15)
            center += 0.15 * rng.uniform(-1, 1, 2).astype(np.float32) \
                * scale * 200.0
            # TopDownGetRandomScaleRotation(rot=45, scale=0.25, prob=0.6)
            scale *= np.clip(rng.randn() * 0.25 + 1, 0.75, 1.25)
            if rng.rand() <= 0.6:
                rot = float(np.clip(rng.randn() * 45.0, -90.0, 90.0))
        mat = np.asarray(affine_matrix(center, scale, rot, (w, h)))
        crop = cv2.warpAffine(img, mat[:2], (w, h),
                              flags=cv2.INTER_LINEAR)
        joints[:, :2] = np.asarray(apply_affine_to_points(
            joints[:, :2], mat))
        rec2['joints_3d'] = joints
        rec2['joints_3d_visible'] = vis
        tg = training_targets(
            rec2, image_size=self.image_size,
            heatmap_size=self.heatmap_size,
            depth_bound=self.depth_bound,
            root_depth_bins=self.root_depth_bins,
            root_depth_bound=self.root_depth_bound, sigma=self.sigma)
        return crop.astype(np.float32) / 255.0, tg

    def __iter__(self):
        order = np.arange(len(self.ds.db))
        rng = None
        if self.is_train:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(order)
        bs = self.batch_size
        for b in range(len(self)):
            idxs = order[b * bs:(b + 1) * bs]
            if len(idxs) < bs:               # static shapes: repeat-pad
                idxs = np.concatenate([idxs, order[:bs - len(idxs)]])
            crops, tgs = zip(*[self._prepare(self.ds.db[i], rng)
                               for i in idxs])
            yield dict(
                imgs=np.stack(crops),
                hm3d=np.stack([t['hm3d'] for t in tgs]),
                hm_weight=np.stack([t['hm_weight'][:, 0] for t in tgs]),
                rel_root_mm=np.stack([t['rel_root_depth_mm'][0]
                                      for t in tgs]),
                root_weight=np.stack([t['rel_root_weight'][0]
                                      for t in tgs]),
                hand_type=np.stack([t['hand_type'] for t in tgs]),
                type_weight=np.stack([t['hand_type_weight'][0]
                                      for t in tgs]),
            )


def make_interhand_train_step(model, tx, root_depth_bins=64,
                              root_depth_bound=400.0):
    """Training step: train forward (BN stats advanced) + the three
    reference losses + optimizer update. Returns an UNJITTED
    step(params, stats, opt_state, batch) -> (params, stats, opt_state,
    metrics); the loop jits it over the mesh via data_parallel_step.
    """
    import jax
    import jax.numpy as jnp
    from ..models.interhand3d import interhand3d_losses

    def loss_fn(params, stats, batch):
        variables = {
            'backbone': {**batch_stats_of(stats, 'backbone'),
                         'params': params['backbone']},
            'head': {**batch_stats_of(stats, 'head'),
                     'params': params['head']},
        }
        out, new_vars = model.train_apply(variables, batch['imgs'])
        losses = interhand3d_losses(
            out, batch['hm3d'], batch['hm_weight'], batch['rel_root_mm'],
            batch['root_weight'], batch['hand_type'],
            batch['type_weight'], root_depth_bins=root_depth_bins,
            root_depth_range_mm=root_depth_bound)
        total = (losses['hand_loss'] + losses['rel_root_loss']
                 + losses['hand_type_loss'])
        new_stats = {k: {c: v for c, v in new_vars[k].items()
                         if c != 'params'} for k in new_vars}
        return total, (losses, new_stats)

    def batch_stats_of(stats, key):
        return {c: v for c, v in stats.get(key, {}).items()}

    def step(params, stats, opt_state, batch):
        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, stats, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        metrics = dict(losses, total_loss=total)
        return params, new_stats, opt_state, metrics

    return step


def train_interhand3d_model(cfg: dict, work_dir: Optional[str] = None,
                            resume: bool = False,
                            max_steps: Optional[int] = None):
    """Train an interhand3d config (see
    configs/hand/res50_interhand3d_all_256x256.py). Returns
    (variables, metrics of the last step)."""
    import jax
    import optax
    from .loop import build_model_from_cfg

    dcfg = cfg['data']
    tcfg = cfg.get('target', {})
    model = build_model_from_cfg(cfg['model'])
    train_cfg = dcfg['train']
    ds = InterHandDataset(train_cfg['ann_file'], train_cfg['camera_file'],
                          train_cfg['joint_file'],
                          img_prefix=train_cfg.get('img_prefix', ''))
    hm_wh = tuple(dcfg.get('heatmap_size', (64, 64)))
    loader = InterHandLoader(
        ds, dcfg.get('batch_size', 16),
        image_size=tuple(dcfg.get('image_size', (256, 256))),
        heatmap_size=(hm_wh[0], hm_wh[1],
                      cfg['model'].get('depth_size', 64)),
        depth_bound=tcfg.get('depth_bound', 400.0),
        root_depth_bins=tcfg.get('root_depth_bins', 64),
        root_depth_bound=tcfg.get('root_depth_bound', 400.0),
        sigma=tcfg.get('sigma', 2.5))

    sample = next(iter(loader))
    rng = jax.random.PRNGKey(cfg.get('seed', 0))
    variables = model.init(rng, sample['imgs'])
    variables, _ = _resume_loop_weights(cfg, work_dir, variables, resume)
    params = {k: variables[k]['params'] for k in variables}
    stats = {k: {c: v for c, v in variables[k].items() if c != 'params'}
             for k in variables}

    ocfg = cfg.get('optimizer', {})
    tx = optax.adamw(ocfg.get('base_lr', 2e-4),
                     weight_decay=ocfg.get('weight_decay', 0.0))
    opt_state = tx.init(params)
    step = make_interhand_train_step(
        model, tx, root_depth_bins=tcfg.get('root_depth_bins', 64),
        root_depth_bound=tcfg.get('root_depth_bound', 400.0))
    # data-parallel over the mesh (the reference trains interhand3d under
    # DDP via tools/dist_train.sh): batch shards over `data`, XLA inserts
    # the gradient psum; BN stats reduce globally (sync-BN,
    # docs/parallelism.md)
    import math
    from ..parallel.mesh import make_mesh, data_parallel_step
    n_data = cfg.get('runtime', {}).get('n_data') or math.gcd(
        dcfg.get('batch_size', 16), jax.device_count())
    dp_mesh = make_mesh(n_data=n_data, n_expert=1,
                        devices=jax.devices()[:n_data])
    step, place_batch = data_parallel_step(step, dp_mesh, n_args=4,
                                           batch_argnums={3})

    total_epochs = ocfg.get('total_epochs', 20)
    metrics = {}
    n_steps = 0
    done = False
    best = None
    for epoch in range(total_epochs):
        loader.set_epoch(epoch)
        for batch in loader:
            params, stats, opt_state, metrics = step(
                params, stats, opt_state, place_batch(batch))
            n_steps += 1
            if max_steps is not None and n_steps >= max_steps:
                done = True
                break
        if done:
            break
        if _should_eval(cfg, epoch):
            from ..eval.families import evaluate_interhand3d
            cur = {k: {**stats[k], 'params': params[k]} for k in params}
            stats_val = evaluate_interhand3d(cfg, model, cur)
            _log_val_stats(cfg, work_dir, stats_val, epoch + 1)
            best = _save_best_ckpt(cfg, work_dir, stats_val, cur, best)
    variables = {k: {**stats[k], 'params': params[k]} for k in params}
    metrics = {m: float(v) for m, v in metrics.items()}
    _save_loop_outputs(cfg, work_dir, variables, metrics, n_steps)
    return variables, metrics


def _resume_loop_weights(cfg, work_dir, variables, resume):
    """Weight-level resume for the family loops: load work_dir/final.npz
    over the fresh init when --resume is given (the tools/train.py
    contract; optimizer state restarts — these loops checkpoint weights
    only). Returns (variables, resumed_bool)."""
    import os
    work_dir = work_dir or cfg.get('runtime', {}).get('work_dir')
    if not resume or not work_dir:
        return variables, False
    path = os.path.join(work_dir, 'final.npz')
    if not os.path.exists(path):
        return variables, False
    from ..utils.checkpoint import load_params_npz
    print(f'resuming weights from {path} (optimizer state restarts)')
    return load_params_npz(path), True


def _save_loop_outputs(cfg, work_dir, variables, metrics, n_steps):
    """Persist final weights (.npz) + a metrics line, the contract the
    topdown loop's work_dir provides (checkpoint + log.json)."""
    import json
    import os
    work_dir = work_dir or cfg.get('runtime', {}).get('work_dir')
    if not work_dir:
        return
    from ..utils.checkpoint import save_params_npz
    os.makedirs(work_dir, exist_ok=True)
    save_params_npz(os.path.join(work_dir, 'final.npz'), variables)
    with open(os.path.join(work_dir, 'train.log.json'), 'a') as f:
        f.write(json.dumps(dict(metrics, step=n_steps)) + '\n')


def _log_val_stats(cfg, work_dir, stats, epoch):
    """Append a mode='val' line to train.log.json (the EvalHook logging
    contract the topdown loop provides)."""
    import json
    import os
    work_dir = work_dir or cfg.get('runtime', {}).get('work_dir')
    if not work_dir:
        return
    os.makedirs(work_dir, exist_ok=True)
    with open(os.path.join(work_dir, 'train.log.json'), 'a') as f:
        f.write(json.dumps(dict({k: float(v) for k, v in stats.items()},
                                mode='val', epoch=epoch)) + '\n')


def _should_eval(cfg, epoch):
    """True when the reference-style `evaluation = dict(interval=N)`
    config asks for validation after this (0-based) epoch."""
    interval = cfg.get('evaluation', {}).get('interval', 0)
    return bool(interval) and 'val' in cfg.get('data', {}) \
        and (epoch + 1) % interval == 0


def _save_best_ckpt(cfg, work_dir, stats, variables, best):
    """`save_best = '<metric>'` (in runtime or evaluation, matching the
    topdown loop) keeps the best-scoring weights in work_dir/best.npz —
    the EvalHook best-checkpoint contract (reference
    core/evaluation/eval_hooks.py + checkpoint hook save_best). The
    min/max direction is inferred from the metric name (MPJPE/NME/EPE/
    loss are less-is-better, reference MMPOSE_LESS_KEYS) unless
    save_best_mode overrides it. Returns the updated best value."""
    import os
    from ..utils.checkpoint import _LESS_IS_BETTER, save_params_npz
    rcfg = cfg.get('runtime', {})
    key = rcfg.get('save_best') or cfg.get('evaluation', {}).get(
        'save_best')
    work_dir = work_dir or rcfg.get('work_dir')
    if not key or key not in stats or not work_dir:
        return best
    mode = rcfg.get('save_best_mode') or cfg.get('evaluation', {}).get(
        'save_best_mode')
    if mode is None:
        mode = 'min' if any(m in key for m in _LESS_IS_BETTER) else 'max'
    v = float(stats[key])
    if best is None or (v < best if mode == 'min' else v > best):
        os.makedirs(work_dir, exist_ok=True)
        save_params_npz(os.path.join(work_dir, 'best.npz'), variables)
        return v
    return best

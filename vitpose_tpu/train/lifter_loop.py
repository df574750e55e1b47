"""PoseLifter (VideoPose3D) training loop, config-driven.

Counterpart of the reference pose-lift training (PoseLifter detector,
mmpose/models/detectors/pose_lifter.py, with Body3DH36MDataset 2D->3D
windows). One jit step: TCN forward over [N, T, K, 2] windows -> MPJPE
loss on root-relative 3D -> Adam with per-epoch exponential lr decay
(the VideoPose3D recipe's `lr_decay`).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..data.body3d import Body3DH36MDataset
from .interhand_loop import (_log_val_stats, _save_best_ckpt,
                             _save_loop_outputs, _should_eval)


def train_pose_lifter_model(cfg: dict, work_dir: Optional[str] = None,
                            resume: bool = False,
                            max_steps: Optional[int] = None):
    """Train a pose_lifter config (see
    configs/body3d/videopose3d_h36m_27frames.py). Returns
    (variables, last-step metrics)."""
    import jax
    import jax.numpy as jnp
    import optax
    from .loop import build_model_from_cfg
    from ..models.losses_regression import mpjpe_loss

    model = build_model_from_cfg(cfg['model'])
    dcfg = cfg['data']
    ds = Body3DH36MDataset(dcfg['train']['ann_file'],
                           seq_len=dcfg.get('seq_len', 27),
                           causal=dcfg.get('causal', False))
    batch_size = dcfg.get('batch_size', 128)

    ocfg = cfg.get('optimizer', {})
    base_lr = ocfg.get('base_lr', 1e-3)
    lr_decay = ocfg.get('lr_decay', 1.0)
    total_epochs = ocfg.get('total_epochs', 160)
    steps_per_epoch = max(1, len(ds) // batch_size)
    # per-epoch exponential decay as a step schedule
    schedule = optax.exponential_decay(
        base_lr, transition_steps=steps_per_epoch, decay_rate=lr_decay,
        staircase=True)
    tx = optax.adam(schedule)

    sample = ds[0]
    rng = jax.random.PRNGKey(cfg.get('seed', 0))
    x0 = jnp.asarray(sample['input_2d'])[None] / 1000.0
    variables = model.init(rng, x0, train=False)
    opt_state = tx.init(variables)

    @jax.jit
    def step(variables, opt_state, x, y_rel, drop_rng):
        # train=True: BN normalizes by batch statistics (running stats
        # leave the gradient graph -> zero grads/updates for them) and
        # dropout fires; the mutated stats are merged back afterwards.
        def loss_fn(v):
            out, upd = model.apply(v, x, train=True,
                                   mutable=['batch_stats'],
                                   rngs={'dropout': drop_rng})
            return mpjpe_loss(out, y_rel), upd
        (loss, upd), grads = jax.value_and_grad(loss_fn,
                                                has_aux=True)(variables)
        updates, opt_state = tx.update(grads, opt_state, variables)
        variables = optax.apply_updates(variables, updates)
        return {**variables, **upd}, opt_state, dict(mpjpe_loss=loss)

    metrics = {}
    n_steps = 0
    done = False
    best = None
    order = np.arange(len(ds))
    for epoch in range(total_epochs):
        np.random.RandomState(cfg.get('seed', 0) + epoch).shuffle(order)
        for b in range(steps_per_epoch):
            idxs = order[b * batch_size:(b + 1) * batch_size]
            if len(idxs) < batch_size:    # static shapes: repeat-pad
                idxs = np.concatenate([idxs, order[:batch_size
                                                   - len(idxs)]])
            x = jnp.stack([jnp.asarray(ds[int(i)]['input_2d'])
                           for i in idxs]) / 1000.0
            y = jnp.stack([jnp.asarray(ds[int(i)]['target_3d'])
                           for i in idxs])
            y_rel = y - y[:, :1]
            variables, opt_state, metrics = step(
                variables, opt_state, x, y_rel,
                jax.random.fold_in(rng, n_steps))
            n_steps += 1
            if max_steps is not None and n_steps >= max_steps:
                done = True
                break
        if done:
            break
        if _should_eval(cfg, epoch):
            from ..eval.families import evaluate_pose_lifter
            stats_val = evaluate_pose_lifter(cfg, model, variables)
            _log_val_stats(cfg, work_dir, stats_val, epoch + 1)
            best = _save_best_ckpt(cfg, work_dir, stats_val, variables,
                                   best)
    metrics = {m: float(v) for m, v in metrics.items()}
    _save_loop_outputs(cfg, work_dir, variables, metrics, n_steps)
    return variables, metrics

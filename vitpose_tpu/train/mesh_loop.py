"""Mesh (HMR + adversarial prior) training loop, config-driven.

Counterpart of the reference ParametricMesh training path
(mmpose/models/detectors/mesh.py `ParametricMesh.train_step` with
`MeshMixDataset` + `MeshAdversarialDataset`, launched by apis/train.py
through the DistributedDataParallelWrapper). Here: `MeshAdvLoader`
batches (Mixed datasets + Mosh SMPL prior samples), and
`make_adversarial_train_step` updates generator and discriminator in ONE
jit program (no DDP wrapper needed — GSPMD shards the same program).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..data.mesh import (MeshAdvLoader, MeshDataset, MeshMixDataset,
                         MoshDataset)
from .interhand_loop import (_log_val_stats, _save_best_ckpt,
                             _save_loop_outputs, _should_eval)


def train_mesh_model(cfg: dict, work_dir: Optional[str] = None,
                     resume: bool = False,
                     max_steps: Optional[int] = None):
    """Train a mesh config (see configs/mesh/hmr_res50_mixed_224x224.py).
    Returns ({'gen': variables, 'disc': variables}, last-step losses)."""
    import jax
    import jax.numpy as jnp
    import optax
    from .loop import build_model_from_cfg
    from ..models.mesh import SMPLDiscriminator, make_adversarial_train_step

    mesh = build_model_from_cfg(cfg['model'])
    disc = SMPLDiscriminator(
        hidden=cfg['model'].get('disc_hidden', 1024))

    dcfg = cfg['data']
    tr = dcfg['train']
    image_size = tuple(dcfg.get('image_size', (224, 224)))
    parts = [MeshDataset(c['ann_file'], c.get('img_prefix', ''),
                         image_size=image_size)
             for c in tr['configs']]
    mix = MeshMixDataset(parts, partition=tr.get(
        'partition', [1.0 / len(parts)] * len(parts)))
    mosh = MoshDataset(tr['adv_ann_file'])
    loader = MeshAdvLoader(mix, mosh,
                           batch_size=dcfg.get('batch_size', 64),
                           image_size=image_size,
                           seed=cfg.get('seed', 0))

    ocfg = cfg.get('optimizer', {})
    gen_tx = optax.adam(ocfg.get('base_lr', 2.5e-4))
    disc_tx = optax.adam(ocfg.get('disc_lr', 1e-4))

    rng = jax.random.PRNGKey(cfg.get('seed', 0))
    batch = next(iter(loader))
    imgs = jnp.asarray(batch['imgs'], jnp.float32)
    gen_vars = mesh.init(rng, imgs)
    disc_vars = disc.init(rng, jnp.zeros((imgs.shape[0], 72)),
                          jnp.zeros((imgs.shape[0], 10)))
    from .interhand_loop import _resume_loop_weights
    both, resumed = _resume_loop_weights(
        cfg, work_dir, {'gen': gen_vars, 'disc': disc_vars}, resume)
    if resumed:
        gen_vars, disc_vars = both['gen'], both['disc']
    gen_opt = gen_tx.init(gen_vars)
    disc_opt = disc_tx.init(disc_vars)
    # data-parallel over the mesh (the reference trains HMR under DDP,
    # apis/train.py:129): image + mosh batches shard over `data`, the
    # generator AND discriminator gradient psums are inserted by XLA
    import math
    from ..parallel.mesh import make_mesh, data_parallel_step
    n_data = cfg.get('runtime', {}).get('n_data') or math.gcd(
        dcfg.get('batch_size', 64), jax.device_count())
    dp_mesh = make_mesh(n_data=n_data, n_expert=1,
                        devices=jax.devices()[:n_data])
    step, place_batch = data_parallel_step(
        make_adversarial_train_step(mesh, disc, gen_tx, disc_tx),
        dp_mesh, n_args=5, batch_argnums={4})

    metrics = {}
    n_steps = 0
    done = False
    best = None
    for epoch in range(ocfg.get('total_epochs', 100)):
        loader.set_epoch(epoch)
        for batch in loader:
            jb = place_batch({k: np.asarray(v) for k, v in batch.items()
                              if k not in ('pose', 'beta', 'has_smpl')})
            gen_vars, disc_vars, gen_opt, disc_opt, metrics = step(
                gen_vars, disc_vars, gen_opt, disc_opt, jb)
            n_steps += 1
            if max_steps is not None and n_steps >= max_steps:
                done = True
                break
        if done:
            break
        if _should_eval(cfg, epoch):
            from ..eval.families import evaluate_mesh
            stats_val = evaluate_mesh(cfg, mesh, gen_vars)
            _log_val_stats(cfg, work_dir, stats_val, epoch + 1)
            best = _save_best_ckpt(cfg, work_dir, stats_val,
                                   {'gen': gen_vars, 'disc': disc_vars},
                                   best)
    variables = {'gen': gen_vars, 'disc': disc_vars}
    metrics = {m: float(v) for m, v in metrics.items()}
    _save_loop_outputs(cfg, work_dir, variables, metrics, n_steps)
    return variables, metrics

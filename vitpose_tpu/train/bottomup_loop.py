"""Bottom-up (associative embedding) training: loader + step + loop.

Counterpart of the reference bottom-up training path (AssociativeEmbedding
detector with MultiLossFactory, mmpose/models/detectors/
associative_embedding.py + losses/multi_loss_factory.py:164). TPU-first
shape: images resize onto one static square canvas on host; heatmap
targets, loss masks, and padded AE joint indices are built per batch; the
jit step computes masked heatmap MSE + push/pull tag losses in one program.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..data.bottomup import BottomUpCocoDataset, generate_ae_targets
from ..models.losses_regression import ae_heatmap_loss, ae_tag_loss


class BottomUpLoader:
    """Batches of (imgs [N,S,S,3] f32-normalized later on device, heatmap
    targets, masks, ae joint indices) from a BottomUpCocoDataset."""

    def __init__(self, dataset: BottomUpCocoDataset, batch_size,
                 output_size=None, sigma=2.0, seed=0, is_train=True,
                 use_udp=False):
        self.ds = dataset
        self.batch_size = batch_size
        self.input_size = dataset.input_size
        self.output_size = output_size or dataset.output_sizes[0]
        self.sigma = sigma
        self.seed = seed
        self.is_train = is_train
        self.use_udp = use_udp
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __len__(self):
        return max(1, len(self.ds) // self.batch_size)

    def __iter__(self):
        import cv2
        rng = np.random.RandomState(self.seed + self.epoch)
        order = np.arange(len(self.ds))
        if self.is_train:
            rng.shuffle(order)
        s = self.input_size
        bs = self.batch_size
        for b in range(len(self)):
            idxs = order[b * bs:(b + 1) * bs]
            imgs, hms, masks, aes = [], [], [], []
            for i in idxs:
                rec = self.ds.record(int(i))
                img = cv2.imread(rec['image_file'])
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                f = s / max(img.shape[:2])
                resized = cv2.resize(img, (int(round(img.shape[1] * f)),
                                           int(round(img.shape[0] * f))))
                canvas = np.zeros((s, s, 3), np.uint8)
                canvas[:resized.shape[0], :resized.shape[1]] = resized
                joints = rec['joints'].copy()
                joints[..., :2] *= f
                flipped = self.is_train and rng.rand() < 0.5
                if flipped:
                    canvas = canvas[:, ::-1]
                    fi = self.ds.info.flip_index
                    joints = joints[:, fi]
                    joints[..., 0] = s - 1 - joints[..., 0]
                mask = self.ds.build_loss_mask(rec)
                mask = cv2.resize(mask, (resized.shape[1],
                                         resized.shape[0]))
                mask_c = np.zeros((s, s), np.float32)
                mask_c[:resized.shape[0], :resized.shape[1]] = mask
                if flipped:
                    # keep the loss mask aligned to the flipped canvas
                    mask_c = mask_c[:, ::-1]
                t = generate_ae_targets(joints, mask_c, s,
                                        self.output_size,
                                        sigma=self.sigma,
                                        max_people=self.ds.max_people,
                                        use_udp=self.use_udp)
                imgs.append(canvas)
                hms.append(np.asarray(t['heatmaps']))
                masks.append(np.asarray(t['mask']))
                aes.append(np.asarray(t['ae_joints']))
            yield dict(imgs=np.stack(imgs), heatmaps=np.stack(hms),
                       masks=np.stack(masks), ae_joints=np.stack(aes))


def split_bottomup_variables(variables):
    """{'backbone': {params, batch_stats?}, 'head': ...} -> (params tree,
    batch_stats tree) so the optimizer touches ONLY params (BN running
    stats must not receive gradient updates)."""
    # a parameterless submodule (e.g. the identity AEMultiStageHead of the
    # hourglass_ae config) has no 'params' collection at all
    params = {k: v.get('params', {}) for k, v in variables.items()}
    stats = {k: v.get('batch_stats', {}) for k, v in variables.items()}
    return params, stats


def join_bottomup_variables(params, stats):
    out = {}
    for k in params:
        v = {'params': params[k]}
        if stats.get(k):
            v['batch_stats'] = stats[k]
        out[k] = v
    return out


def make_bottomup_train_step(estimator, push_loss_factor=0.001,
                             pull_loss_factor=0.001, heatmap_loss_factor=1.0,
                             ae_loss_type='exp'):
    """(variables, opt_state, batch) -> losses; tx applied outside.

    Returns a pure function suitable for jax.jit: batch carries uint8 imgs,
    heatmap targets [N,K,S,S], masks [N,S,S], ae_joints [N,M,K,2].
    """
    import jax
    import jax.numpy as jnp
    from ..data.pipeline import IMAGENET_MEAN, IMAGENET_STD

    k = estimator.num_joints

    def _forward(params, batch_stats, x, train):
        """Apply with the proper BN semantics: batch statistics collected
        in train mode (mutable batch_stats), running stats excluded from
        the gradient/optimizer path. params/batch_stats are the
        {'backbone': ..., 'head': ...} split of the estimator variables
        (see split_bottomup_variables)."""
        variables = join_bottomup_variables(params, batch_stats)
        if train:
            return estimator.apply(variables, x, train=True, mutable=True)
        return estimator.apply(variables, x, train=False), batch_stats

    def loss_fn(params, batch_stats, batch, train=True):
        x = batch['imgs'].astype(jnp.float32) / 255.0
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        out, new_stats = _forward(params, batch_stats, x, train)
        # multi-resolution heads (AEHigherResolutionHead) return a list:
        # every output gets a heatmap loss against the resized target
        # (reference MultiLossFactory with_heatmaps_loss=[True, True]);
        # the AE tag loss uses the first output carrying tag channels.
        outs = list(out) if isinstance(out, (list, tuple)) else [out]
        hm_loss = 0.0
        hm = tags = None
        for o in outs:
            o_hm = o[..., :k].transpose(0, 3, 1, 2)
            oh, ow = o_hm.shape[2], o_hm.shape[3]
            t = jax.image.resize(batch['heatmaps'],
                                 batch['heatmaps'].shape[:2] + (oh, ow),
                                 method='bilinear')
            m = jax.image.resize(batch['masks'],
                                 batch['masks'].shape[:1] + (oh, ow),
                                 method='nearest')
            hm_loss = hm_loss + (ae_heatmap_loss(o_hm, t, m)
                                 * heatmap_loss_factor)
            if hm is None and o.shape[-1] > k:
                hm = o_hm
                tags = o[..., k:].transpose(0, 3, 1, 2)
        if hm is None:           # no tag channels anywhere (no-AE config)
            hm = outs[0][..., :k].transpose(0, 3, 1, 2)
            tags = jnp.zeros_like(hm)
        th, tw = hm.shape[2], hm.shape[3]

        # rescale ae joint flat indices to the output resolution
        s_t = batch['heatmaps'].shape[2]
        ae = batch['ae_joints']
        ys = (ae[..., 0] // s_t).astype(jnp.float32) * th / s_t
        xs = (ae[..., 0] % s_t).astype(jnp.float32) * tw / s_t
        flat = (jnp.clip(ys.astype(jnp.int32), 0, th - 1) * tw
                + jnp.clip(xs.astype(jnp.int32), 0, tw - 1))
        # per-joint tag maps flattened to [N, K*H*W, 1]
        n = hm.shape[0]
        joint_off = jnp.arange(k)[None, None, :] * th * tw
        ae_flat = jnp.stack([flat + joint_off, ae[..., 1]], axis=-1)
        tags_flat = tags.reshape(n, k * th * tw, 1)
        push, pull = ae_tag_loss(tags_flat, ae_flat,
                                 loss_type=ae_loss_type)
        push_loss = jnp.mean(push) * push_loss_factor
        pull_loss = jnp.mean(pull) * pull_loss_factor
        total = hm_loss + push_loss + pull_loss
        metrics = dict(heatmap_loss=hm_loss, push_loss=push_loss,
                       pull_loss=pull_loss, total_loss=total)
        return total, (metrics, new_stats)

    def train_step(params, batch_stats, opt_state, batch, tx):
        import optax
        (_, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, metrics

    return loss_fn, train_step


def train_bottomup_model(cfg: dict, work_dir=None, resume=False,
                         max_steps=None):
    """Epoch loop for bottom-up AE configs (family='bottomup'), the
    counterpart of the reference AssociativeEmbedding training (runner +
    MultiLossFactory). Logs json-lines like the top-down loop and saves
    npz checkpoints per epoch."""
    import functools
    import json
    import os
    import time

    import jax
    import jax.numpy as jnp
    import optax

    from .loop import build_model_from_cfg
    from ..utils.checkpoint import save_params_npz, load_params_npz

    work_dir = work_dir or cfg.get('runtime', {}).get(
        'work_dir', 'work_dirs/bottomup')
    os.makedirs(work_dir, exist_ok=True)
    dcfg = cfg['data']
    est = build_model_from_cfg(cfg['model'])

    ds = BottomUpCocoDataset(
        dcfg['train']['ann_file'], dcfg['train']['img_prefix'],
        dataset_info=dcfg.get('dataset', 'coco'),
        input_size=dcfg.get('input_size', 512),
        output_sizes=tuple(dcfg.get('output_sizes', (128,))),
        max_people=dcfg.get('max_people', 30))
    loader = BottomUpLoader(ds, dcfg.get('batch_size', 24),
                            output_size=dcfg.get('output_sizes',
                                                 (128,))[0],
                            sigma=cfg.get('target', {}).get('sigma', 2.0),
                            seed=cfg.get('runtime', {}).get('seed', 0),
                            use_udp=dcfg.get('use_udp', False))

    ocfg = cfg.get('optimizer', {})
    total_epochs = ocfg.get('total_epochs', 300)
    steps_per_epoch = max(1, len(loader))
    sched = optax.piecewise_constant_schedule(
        ocfg.get('base_lr', 1.5e-3),
        {e * steps_per_epoch: 0.1 for e in ocfg.get('decay_epochs',
                                                    (200, 260))})
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))

    rng = jax.random.PRNGKey(cfg.get('runtime', {}).get('seed', 0))
    size = dcfg.get('input_size', 512)
    variables = est.init(rng, jnp.zeros((1, size, size, 3)))
    start_epoch = 0
    latest = os.path.join(work_dir, 'latest.npz')
    opt_path = os.path.join(work_dir, 'opt.npz')
    if resume and os.path.exists(latest):
        variables = load_params_npz(latest)
        meta_path = os.path.join(work_dir, 'latest.json')
        if os.path.exists(meta_path):
            meta = json.load(open(meta_path))
            start_epoch = meta['epoch'] + 1
        # missing meta (killed between the npz and json writes): resume
        # the weights but restart the epoch counter rather than crash
    params, batch_stats = split_bottomup_variables(variables)
    opt_state = tx.init(params)
    if resume and os.path.exists(opt_path):
        # restore adam moments + schedule count: flat leaves back into the
        # freshly-initialized opt_state structure
        leaves, treedef = jax.tree_util.tree_flatten(opt_state)
        with np.load(opt_path) as z:
            loaded = [jnp.asarray(z[f'leaf_{i}'])
                      for i in range(len(leaves))]
        opt_state = jax.tree_util.tree_unflatten(treedef, loaded)

    _, train_step = make_bottomup_train_step(est)
    step_j = jax.jit(functools.partial(train_step, tx=tx))

    done = 0
    for epoch in range(start_epoch, total_epochs):
        loader.set_epoch(epoch)
        t0 = time.time()
        for it, batch in enumerate(loader):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            params, batch_stats, opt_state, metrics = step_j(
                params, batch_stats, opt_state, batch)
            done += 1
            if it % cfg.get('runtime', {}).get('log_interval', 50) == 0:
                rec = {'mode': 'train', 'epoch': epoch, 'iter': it,
                       'step': done,
                       **{k: float(v) for k, v in metrics.items()}}
                from .loop import _log
                _log(work_dir, rec)
            if max_steps and done >= max_steps:
                break
        variables = join_bottomup_variables(params, batch_stats)
        save_params_npz(latest, variables)
        opt_leaves = jax.tree_util.tree_leaves(opt_state)
        np.savez(opt_path, **{f'leaf_{i}': np.asarray(l)
                              for i, l in enumerate(opt_leaves)})
        # atomic meta write: a kill between the npz and json writes must
        # not leave an unresumable work_dir
        meta_path = os.path.join(work_dir, 'latest.json')
        with open(meta_path + '.tmp', 'w') as f:
            json.dump({'epoch': epoch}, f)
        os.replace(meta_path + '.tmp', meta_path)
        print(json.dumps({'mode': 'epoch_done', 'epoch': epoch,
                          'secs': round(time.time() - t0, 1)}), flush=True)
        if max_steps and done >= max_steps:
            break
    return join_bottomup_variables(params, batch_stats)

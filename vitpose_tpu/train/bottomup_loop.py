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


class BottomUpAugConfig:
    """Reference train recipe knobs (BottomUpRandomAffine +
    BottomUpRandomFlip, e.g. higherhrnet_w32_coco_512x512.py:122-128:
    rot 30, scale [0.75, 1.5], scale_type 'short', trans 40, flip 0.5)."""

    def __init__(self, rot_factor=30.0, scale_factor=(0.75, 1.5),
                 scale_type='short', trans_factor=40, flip_prob=0.5):
        self.rot_factor = rot_factor
        self.scale_factor = tuple(scale_factor)
        self.scale_type = scale_type
        self.trans_factor = trans_factor
        self.flip_prob = flip_prob


class BottomUpLoader:
    """Batches of (imgs [N,S,S,3], PER-SCALE painted heatmap targets +
    masks, ae joint indices) from a BottomUpCocoDataset.

    Training follows the reference pipeline order exactly
    (bottom_up_transform.py): random affine (rotation/scale/translation,
    applied per output scale so every target is PAINTED at its own
    resolution — never bilinear-resized, which would distort sigma and
    peak) -> random flip (per-scale frames) -> HeatmapGenerator +
    JointsEncoder per scale."""

    def __init__(self, dataset: BottomUpCocoDataset, batch_size,
                 output_size=None, output_sizes=None, sigma=2.0, seed=0,
                 is_train=True, use_udp=False,
                 aug: Optional[BottomUpAugConfig] = None):
        self.ds = dataset
        self.batch_size = batch_size
        self.input_size = dataset.input_size
        self.output_sizes = tuple(
            output_sizes if output_sizes is not None
            else ([output_size] if output_size is not None
                  else dataset.output_sizes))
        self.output_size = self.output_sizes[0]
        self.sigma = sigma
        self.seed = seed
        self.is_train = is_train
        self.use_udp = use_udp
        self.aug = aug or BottomUpAugConfig()
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __len__(self):
        return max(1, len(self.ds) // self.batch_size)

    def _train_sample(self, rec, rng, cv2):
        """One augmented training record: reference pipeline order."""
        from ..data.bottomup import (bottomup_random_affine,
                                     bottomup_random_flip,
                                     generate_heatmap_targets)
        s = self.input_size
        img = cv2.imread(rec['image_file'])
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        mask = self.ds.build_loss_mask(rec)
        joints = rec['joints'].copy()
        a = self.aug
        img, masks, joints_s, _ = bottomup_random_affine(
            img, [mask.copy() for _ in self.output_sizes],
            [joints.copy() for _ in self.output_sizes],
            s, self.output_sizes, rng,
            rot_factor=a.rot_factor, scale_factor=a.scale_factor,
            scale_type=a.scale_type, trans_factor=a.trans_factor,
            use_udp=self.use_udp)
        img, masks, joints_s, _ = bottomup_random_flip(
            img, masks, joints_s, self.ds.info.flip_index,
            self.output_sizes, rng, flip_prob=a.flip_prob)
        hms = [generate_heatmap_targets(j, o, sigma=self.sigma,
                                        use_udp=self.use_udp)
               for j, o in zip(joints_s, self.output_sizes)]
        # AE joint indices at scale 0 (JointsEncoder,
        # bottom_up_transform.py:237: truncated-int flat index + validity)
        o0 = self.output_sizes[0]
        j0 = joints_s[0]
        xi = np.trunc(j0[..., 0]).astype(np.int64)
        yi = np.trunc(j0[..., 1]).astype(np.int64)
        inside = (xi >= 0) & (xi < o0) & (yi >= 0) & (yi < o0)
        ae = np.zeros(j0.shape[:2] + (2,), np.int32)
        ae[..., 0] = (np.clip(yi, 0, o0 - 1) * o0 + np.clip(xi, 0, o0 - 1))
        ae[..., 1] = ((j0[..., 2] > 0) & inside).astype(np.int32)
        m = self.ds.max_people
        if ae.shape[0] < m:
            ae = np.pad(ae, [(0, m - ae.shape[0]), (0, 0), (0, 0)])
        return img, hms, masks, ae[:m]

    def _eval_sample(self, rec, cv2):
        """Deterministic path: short-side resize onto the square canvas."""
        s = self.input_size
        img = cv2.imread(rec['image_file'])
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        f = s / max(img.shape[:2])
        resized = cv2.resize(img, (int(round(img.shape[1] * f)),
                                   int(round(img.shape[0] * f))))
        canvas = np.zeros((s, s, 3), np.uint8)
        canvas[:resized.shape[0], :resized.shape[1]] = resized
        joints = rec['joints'].copy()
        joints[..., :2] *= f
        mask = self.ds.build_loss_mask(rec)
        mask = cv2.resize(mask, (resized.shape[1], resized.shape[0]))
        mask_c = np.zeros((s, s), np.float32)
        mask_c[:resized.shape[0], :resized.shape[1]] = mask
        hms, masks = [], []
        for o in self.output_sizes:
            t = generate_ae_targets(joints, mask_c, s, o,
                                    sigma=self.sigma,
                                    max_people=self.ds.max_people,
                                    use_udp=self.use_udp)
            hms.append(np.asarray(t['heatmaps']))
            masks.append(np.asarray(t['mask']))
        t0 = generate_ae_targets(joints, mask_c, s, self.output_sizes[0],
                                 sigma=self.sigma,
                                 max_people=self.ds.max_people,
                                 use_udp=self.use_udp)
        return canvas, hms, masks, np.asarray(t0['ae_joints'])

    def __iter__(self):
        import cv2
        rng = np.random.RandomState(self.seed + self.epoch)
        order = np.arange(len(self.ds))
        if self.is_train:
            rng.shuffle(order)
        bs = self.batch_size
        n_scales = len(self.output_sizes)
        for b in range(len(self)):
            idxs = order[b * bs:(b + 1) * bs]
            imgs, aes = [], []
            hms = [[] for _ in range(n_scales)]
            masks = [[] for _ in range(n_scales)]
            for i in idxs:
                rec = self.ds.record(int(i))
                if self.is_train:
                    img, h, m, ae = self._train_sample(rec, rng, cv2)
                else:
                    img, h, m, ae = self._eval_sample(rec, cv2)
                imgs.append(img)
                aes.append(ae)
                for si in range(n_scales):
                    hms[si].append(np.asarray(h[si]))
                    masks[si].append(np.asarray(m[si]))
            yield dict(
                imgs=np.stack(imgs),
                heatmaps=np.stack(hms[0]), masks=np.stack(masks[0]),
                multi_heatmaps=tuple(np.stack(h) for h in hms),
                multi_masks=tuple(np.stack(m) for m in masks),
                ae_joints=np.stack(aes))


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
        # per-scale PAINTED targets (reference BottomUpGenerateTarget: one
        # HeatmapGenerator per output size — resizing one painted map would
        # change its sigma/peak); output i pairs with target scale i like
        # MultiLossFactory. A resolution mismatch (an output size the
        # loader didn't paint) falls back to resizing the nearest target.
        tgt_hms = batch.get('multi_heatmaps', (batch['heatmaps'],))
        tgt_masks = batch.get('multi_masks', (batch['masks'],))
        hm_loss = 0.0
        hm = tags = None
        for si, o in enumerate(outs):
            o_hm = o[..., :k].transpose(0, 3, 1, 2)
            oh, ow = o_hm.shape[2], o_hm.shape[3]
            t = tgt_hms[min(si, len(tgt_hms) - 1)]
            m = tgt_masks[min(si, len(tgt_masks) - 1)]
            if t.shape[2:] != (oh, ow):
                t = jax.image.resize(t, t.shape[:2] + (oh, ow),
                                     method='bilinear')
            if m.shape[1:] != (oh, ow):
                m = jax.image.resize(m, m.shape[:1] + (oh, ow),
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
    acfg = dcfg.get('aug', {})
    aug = BottomUpAugConfig(
        rot_factor=acfg.get('rot_factor', 30.0),
        scale_factor=tuple(acfg.get('scale_factor', (0.75, 1.5))),
        scale_type=acfg.get('scale_type', 'short'),
        trans_factor=acfg.get('trans_factor', 40),
        flip_prob=acfg.get('flip_prob', 0.5))
    loader = BottomUpLoader(ds, dcfg.get('batch_size', 24),
                            output_sizes=tuple(dcfg.get('output_sizes',
                                                        (128,))),
                            sigma=cfg.get('target', {}).get('sigma', 2.0),
                            seed=cfg.get('runtime', {}).get('seed', 0),
                            use_udp=dcfg.get('use_udp', False),
                            aug=aug)

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
    # data-parallel over the mesh like the flagship loop (the reference
    # trains AE under DDP via tools/dist_train.sh); BN batch stats reduce
    # over the global batch (sync-BN, see docs/parallelism.md)
    import math
    from ..parallel.mesh import make_mesh, data_parallel_step
    rt = cfg.get('runtime', {})
    n_data = rt.get('n_data') or math.gcd(dcfg.get('batch_size', 24),
                                          jax.device_count())
    mesh = make_mesh(n_data=n_data, n_expert=1,
                     devices=jax.devices()[:n_data])
    step_j, place_batch = data_parallel_step(
        functools.partial(train_step, tx=tx), mesh,
        n_args=4, batch_argnums={3})

    done = 0
    for epoch in range(start_epoch, total_epochs):
        loader.set_epoch(epoch)
        t0 = time.time()
        for it, batch in enumerate(loader):
            # tree-aware: multi_heatmaps/multi_masks are tuples of
            # per-scale arrays with different resolutions
            batch = place_batch(jax.tree.map(np.asarray, batch))
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

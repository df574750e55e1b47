"""PoseWarper (video top-down) training loop, config-driven.

Counterpart of the reference PoseWarper training path
(mmpose/models/detectors/posewarper.py driven by
TopDownPoseTrack18VideoDataset + the standard top-down pipeline, apis/
train.py): 5-frame windows share ONE affine (the bbox lives on the key
frame), the key frame's joints make the MSRA heatmap target, and a
single jit step runs backbone-over-all-frames -> deformable temporal
aggregation -> heatmap head -> JointsMSELoss -> Adam.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..data.posetrack import PoseTrackVideoDataset
from .interhand_loop import (_log_val_stats, _save_best_ckpt,
                             _save_loop_outputs, _should_eval)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def load_window(rec, image_size, flip_pairs=(), rng=None,
                flip_prob=0.5, scale_factor=0.35, rot_factor=45,
                rot_prob=0.6, info=None, half_body_prob=0.0,
                num_joints_half_body=8):
    """One record -> (frames [T, H, W, 3] normalized, joints [K, 2] in
    crop pixels, visible [K], center [2], scale [2]).

    All frames of the window share the key frame's affine (the reference
    TopDownAffine warps the whole image list with one matrix,
    top_down_transform.py:295 applied to data['img'] lists). rng=None
    disables augmentation (the test pipeline). With rng and `info`, the
    reference train pipeline's TopDownHalfBodyTransform
    (top_down_transform.py:176) is applied at `half_body_prob`.
    """
    import cv2
    from ..ops.geometry import bbox_xywh2cs, affine_matrix

    iw, ih = int(image_size[0]), int(image_size[1])
    imgs = [cv2.cvtColor(cv2.imread(f), cv2.COLOR_BGR2RGB)
            for f in rec['image_files']]
    joints = rec['joints_3d'][:, :2].astype(np.float32).copy()
    vis = (rec['joints_3d_visible'][:, 0] > 0).astype(np.float32)
    if 'center' in rec and 'scale' in rec:
        c = np.asarray(rec['center'], np.float32).copy()
        s = np.asarray(rec['scale'], np.float32).copy()
    else:
        c, s = bbox_xywh2cs(rec['bbox'], aspect_ratio=iw / ih)
        c, s = np.array(c, np.float32), np.array(s, np.float32)
    rot = 0.0
    if rng is not None:
        if rng.rand() <= flip_prob and len(flip_pairs):
            w = imgs[0].shape[1]
            imgs = [im[:, ::-1].copy() for im in imgs]
            for a, b in flip_pairs:
                joints[[a, b]] = joints[[b, a]]
                vis[[a, b]] = vis[[b, a]]
            joints[:, 0] = w - joints[:, 0] - 1
            c[0] = w - c[0] - 1
        if (info is not None and vis.sum() > num_joints_half_body
                and rng.rand() < half_body_prob):
            upper = [j for j in info.upper_body_ids if vis[j] > 0]
            lower = [j for j in range(info.num_joints)
                     if j not in info.upper_body_ids and vis[j] > 0]
            sel = (upper if (rng.randn() < 0.5 and len(upper) > 2)
                   else lower if len(lower) > 2 else upper)
            if len(sel) >= 2:
                pts = joints[sel]
                lt, rb = pts.min(axis=0), pts.max(axis=0)
                w2, h2 = rb[0] - lt[0], rb[1] - lt[1]
                ar = iw / ih
                if w2 > ar * h2:
                    h2 = w2 / ar
                elif w2 < ar * h2:
                    w2 = h2 * ar
                c = pts.mean(axis=0).astype(np.float32)
                s = np.array([w2 / 200.0, h2 / 200.0],
                             np.float32) * 1.5
        sf, rf = scale_factor, rot_factor
        s = s * np.clip(rng.randn() * sf + 1, 1 - sf, 1 + sf)
        rot = (np.clip(rng.randn() * rf, -rf * 2, rf * 2)
               if rng.rand() <= rot_prob else 0.0)
    mat = np.asarray(affine_matrix(c[None], s[None],
                                   np.asarray([rot], np.float32),
                                   (iw, ih)))[0]
    crops = [cv2.warpAffine(im.astype(np.float32), mat, (iw, ih),
                            flags=cv2.INTER_LINEAR) for im in imgs]
    frames = np.stack(crops) / 255.0
    frames = (frames - IMAGENET_MEAN) / IMAGENET_STD
    jw = np.concatenate([joints, np.ones((len(joints), 1), np.float32)],
                        axis=1) @ mat.T
    return frames.astype(np.float32), jw[:, :2].astype(np.float32), \
        vis, c, s


def train_posewarper_model(cfg: dict, work_dir: Optional[str] = None,
                           resume: bool = False,
                           max_steps: Optional[int] = None):
    """Train a posewarper config (see
    configs/posetrack/posewarper_hrnet_w48_posetrack18.py). Returns
    (variables, last-step metrics)."""
    import jax
    import jax.numpy as jnp
    import optax
    from .loop import build_model_from_cfg
    from ..models.losses import joints_mse_loss
    from ..ops.target import generate_msra_heatmaps

    model = build_model_from_cfg(cfg['model'])
    dcfg = cfg['data']
    image_size = tuple(dcfg.get('image_size', (288, 384)))
    heatmap_size = tuple(dcfg.get('heatmap_size', (72, 96)))
    tr = dcfg['train']
    # train-time frame selection follows the reference stage-2 recipe:
    # 1 random adjacent support frame per record (frame_index_rand +
    # num_adj_frames=1) unless frame_indices_train pins a fixed set;
    # data.frame_indices is the TEST window spec and is NOT used here.
    fw_train = tuple(dcfg.get('frame_weight_train', (0.0, 1.0)))
    ds = PoseTrackVideoDataset(
        tr['ann_file'], tr.get('img_prefix', ''),
        image_size=image_size, heatmap_size=heatmap_size,
        frame_indices_train=(list(dcfg['frame_indices_train'])
                             if dcfg.get('frame_indices_train')
                             else None),
        frame_index_rand=dcfg.get('frame_index_rand', True),
        frame_index_range=dcfg.get('frame_index_range', (-2, 2)),
        num_adj_frames=dcfg.get('num_adj_frames', 1),
        frame_weight_train=fw_train,
        seed=cfg.get('seed', 0))
    batch_size = dcfg.get('batch_size', 16)
    sigma = cfg.get('target', {}).get('sigma', 3.0)
    flip_pairs = ds.info.flip_pairs
    aug = dcfg.get('aug', {})

    ocfg = cfg.get('optimizer', {})
    schedule = optax.piecewise_constant_schedule(
        ocfg.get('base_lr', 1e-4),
        {e * max(1, len(ds) // batch_size): 0.1
         for e in ocfg.get('decay_epochs', ())})
    tx = optax.adam(schedule)
    # reference stage-2 freezes the neck's trans_layer (posewarper_neck.py
    # freeze_trans_layer=True default: its params get requires_grad=False);
    # mask its updates to zero unless the config opts out
    if cfg['model'].get('neck', {}).get('freeze_trans_layer', True):
        def _frozen_mask(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: any(getattr(k, 'key', None) == 'trans_layer'
                                    for k in path), params)
        tx = optax.chain(tx, optax.masked(optax.set_to_zero(),
                                          _frozen_mask))

    rng = jax.random.PRNGKey(cfg.get('seed', 0))
    t = ds.num_frames
    iw, ih = image_size
    dummy = jnp.zeros((1, t, ih, iw, 3), jnp.float32)
    variables = model.init(rng, dummy, train=False)
    from .interhand_loop import _resume_loop_weights
    variables, _ = _resume_loop_weights(cfg, work_dir, variables, resume)
    params = variables['params']
    stats = {k: v for k, v in variables.items() if k != 'params'}
    opt_state = tx.init(params)

    mutable_cols = list(stats) or ['batch_stats']
    # reference PoseWarper reads frame_weight from img_metas in BOTH
    # forward_train and forward_test (posewarper.py:120-132); the train
    # tuple is identical for every record, so close over it statically
    train_fw = (jnp.asarray(ds.db[0]['frame_weight'])
                if len(ds.db) else jnp.full((t,), 1.0 / t))

    def step(params, stats, opt_state, frames, target, weight):
        def loss_fn(p):
            out, new_vars = model.apply(
                {'params': p, **stats}, frames, train=True,
                frame_weight=train_fw, key_index=0,
                mutable=mutable_cols)
            return joints_mse_loss(out, target, weight), new_vars
        (loss, new_vars), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_vars, opt_state, dict(heatmap_loss=loss)

    # data-parallel over the mesh (the reference trains PoseWarper under
    # DDP via tools/dist_train.sh): frame windows/targets shard over
    # `data`, XLA inserts the gradient psum
    import math
    from ..parallel.mesh import make_mesh, data_parallel_step
    n_data = cfg.get('runtime', {}).get('n_data') or math.gcd(
        batch_size, jax.device_count())
    dp_mesh = make_mesh(n_data=n_data, n_expert=1,
                        devices=jax.devices()[:n_data])
    step, place_batch = data_parallel_step(step, dp_mesh, n_args=6,
                                           batch_argnums={3, 4, 5})

    metrics = {}
    n_steps = 0
    done = False
    best = None
    order = np.arange(len(ds))
    steps_per_epoch = max(1, len(ds) // batch_size)
    for epoch in range(ocfg.get('total_epochs', 20)):
        prng = np.random.RandomState(cfg.get('seed', 0) + epoch)
        prng.shuffle(order)
        for b in range(steps_per_epoch):
            idxs = order[b * batch_size:(b + 1) * batch_size]
            if len(idxs) < batch_size:
                idxs = np.concatenate(
                    [idxs, order[:batch_size - len(idxs)]])
            frames, joints, viss = [], [], []
            for i in idxs:
                f, j, v, _, _ = load_window(
                    ds.db[int(i)], image_size,
                    flip_pairs=flip_pairs, rng=prng,
                    flip_prob=aug.get('flip_prob', 0.5),
                    scale_factor=aug.get('scale_factor', 0.35),
                    rot_factor=aug.get('rot_factor', 45),
                    rot_prob=aug.get('rot_prob', 0.6),
                    info=ds.info,
                    half_body_prob=aug.get('half_body_prob', 0.3))
                frames.append(f)
                joints.append(j)
                viss.append(v)
            target, weight = generate_msra_heatmaps(
                jnp.asarray(np.stack(joints)),
                jnp.asarray(np.stack(viss)),
                image_size, heatmap_size, sigma=sigma)
            fj, target, weight = place_batch(
                (np.stack(frames), np.asarray(target),
                 np.asarray(weight)))
            params, new_vars, opt_state, metrics = step(
                params, stats, opt_state, fj, target, weight)
            stats = {k: v for k, v in new_vars.items() if k != 'params'}
            n_steps += 1
            if max_steps is not None and n_steps >= max_steps:
                done = True
                break
        if done:
            break
        if _should_eval(cfg, epoch):
            from ..eval.families import evaluate_posewarper
            stats_val = evaluate_posewarper(
                cfg, model, {'params': params, **stats})
            _log_val_stats(cfg, work_dir, stats_val, epoch + 1)
            best = _save_best_ckpt(cfg, work_dir, stats_val,
                                   {'params': params, **stats}, best)
    variables = {'params': params, **stats}
    metrics = {m: float(v) for m, v in metrics.items()}
    _save_loop_outputs(cfg, work_dir, variables, metrics, n_steps)
    return variables, metrics

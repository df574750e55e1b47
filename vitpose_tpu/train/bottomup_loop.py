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
                 output_size=None, sigma=2.0, seed=0, is_train=True):
        self.ds = dataset
        self.batch_size = batch_size
        self.input_size = dataset.input_size
        self.output_size = output_size or dataset.output_sizes[0]
        self.sigma = sigma
        self.seed = seed
        self.is_train = is_train
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
                if self.is_train and rng.rand() < 0.5:
                    canvas = canvas[:, ::-1]
                    fi = self.ds.info.flip_index
                    joints = joints[:, fi]
                    joints[..., 0] = s - 1 - joints[..., 0]
                mask = self.ds.build_loss_mask(rec)
                mask = cv2.resize(mask, (resized.shape[1],
                                         resized.shape[0]))
                mask_c = np.zeros((s, s), np.float32)
                mask_c[:resized.shape[0], :resized.shape[1]] = mask
                t = generate_ae_targets(joints, mask_c, s,
                                        self.output_size,
                                        sigma=self.sigma,
                                        max_people=self.ds.max_people)
                imgs.append(canvas)
                hms.append(np.asarray(t['heatmaps']))
                masks.append(np.asarray(t['mask']))
                aes.append(np.asarray(t['ae_joints']))
            yield dict(imgs=np.stack(imgs), heatmaps=np.stack(hms),
                       masks=np.stack(masks), ae_joints=np.stack(aes))


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

    def loss_fn(variables, batch):
        x = batch['imgs'].astype(jnp.float32) / 255.0
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        out = estimator.apply(variables, x, train=False)
        hm = out[..., :k].transpose(0, 3, 1, 2)
        tags = out[..., k:].transpose(0, 3, 1, 2)
        # network output may be lower-res than the targets; resize targets
        th, tw = hm.shape[2], hm.shape[3]
        target = jax.image.resize(batch['heatmaps'],
                                  batch['heatmaps'].shape[:2] + (th, tw),
                                  method='bilinear')
        mask = jax.image.resize(batch['masks'],
                                batch['masks'].shape[:1] + (th, tw),
                                method='nearest')
        hm_loss = ae_heatmap_loss(hm, target, mask) * heatmap_loss_factor

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
        return total, dict(heatmap_loss=hm_loss, push_loss=push_loss,
                           pull_loss=pull_loss, total_loss=total)

    def train_step(variables, opt_state, batch, tx):
        import optax
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables, batch)
        updates, opt_state = tx.update(grads, opt_state, variables)
        variables = optax.apply_updates(variables, updates)
        return variables, opt_state, metrics

    return loss_fn, train_step

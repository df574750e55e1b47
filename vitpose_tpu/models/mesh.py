"""Parametric human mesh estimation (SMPL) with adversarial training.

Counterparts of the reference mesh stack
(mmpose/models/detectors/mesh.py `ParametricMesh`,
 mmpose/models/heads/hmr_head.py `HMRMeshHead`,
 mmpose/models/misc/discriminator.py `SMPLDiscriminator`):

  * `HMRMeshHead` — iterative error-feedback regression: starting from mean
    parameters, N refinement steps of fc layers predict Δ(pose θ[24*rot6d
    simplified to axis-angle 72], shape β[10], camera [3]).
  * `SMPLDiscriminator` — per-joint-angle discriminators + shape
    discriminator + full-pose discriminator (compact fc version).
  * `ParametricMesh` — composes backbone + head with an injectable
    ``smpl_fn(pose, beta) -> (vertices, joints)`` (the SMPL model assets are
    external; tests inject a linear mock). The adversarial train step keeps
    two optimizers in ONE jit program (the reference wraps generator and
    discriminator in separate DDP modules, apis/train.py:121-127 — under
    GSPMD the sharded grads of both just coexist).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

POSE_DIM, SHAPE_DIM, CAM_DIM = 72, 10, 3


class HMRMeshHead(nn.Module):
    """Iterative regression head: feature [N, C] -> (pose, shape, cam).

    pose_dim=144 is the reference layout (hmr_head.py:28 npose = 24*6
    rot6d); 72 is the compact axis-angle variant. The iteration order
    matches the reference forward (cat[x, pose, shape, cam] -> fc1 ->
    fc2 -> delta)."""
    num_iters: int = 3
    hidden: int = 1024
    pose_dim: int = POSE_DIM
    # reference trains with p=0.5 dropout after each fc (hmr_head.py:34-36);
    # enable when the training loop supplies a 'dropout' rng
    use_dropout: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, train: bool = False):
        n = feat.shape[0]

        def _mean_init(rng, shape, dtype=jnp.float32):
            # reference default when no smpl_mean_params file is given:
            # zero pose/shape, cam [1, 0, 0] (hmr_head.py:43-45)
            m = jnp.zeros(shape, dtype)
            return m.at[self.pose_dim + SHAPE_DIM].set(1.0)

        mean = self.param('mean_params', _mean_init,
                          (self.pose_dim + SHAPE_DIM + CAM_DIM,))
        # the reference registers init_pose/init_shape/init_cam as
        # NON-TRAINABLE buffers (hmr_head.py:54-56): freeze the mean so
        # only the decoder deltas learn (zero grad; the mesh loop's plain
        # adam therefore never moves it)
        mean = jax.lax.stop_gradient(mean)
        params = jnp.tile(mean[None], (n, 1))
        fc1 = nn.Dense(self.hidden, dtype=self.dtype, name='fc1')
        fc2 = nn.Dense(self.hidden, dtype=self.dtype, name='fc2')
        out = nn.Dense(self.pose_dim + SHAPE_DIM + CAM_DIM,
                       dtype=self.dtype, name='out')
        det = not (train and self.use_dropout)
        drop1 = nn.Dropout(0.5, deterministic=det)
        drop2 = nn.Dropout(0.5, deterministic=det)
        for _ in range(self.num_iters):
            x = jnp.concatenate([feat, params], axis=-1)
            # NO activation between the fc layers — the reference HMR head
            # is a linear fc stack with dropout only (hmr_head.py:76-80)
            x = drop1(fc1(x))
            x = drop2(fc2(x))
            params = params + out(x)
        pose = params[:, :self.pose_dim]
        shape = params[:, self.pose_dim:self.pose_dim + SHAPE_DIM]
        cam = params[:, self.pose_dim + SHAPE_DIM:]
        return pose, shape, cam


def rot6d_to_rotmat(x):
    """[N, 24*6] rot6d -> [N*24, 3, 3] rotation matrices (Zhou et al.
    CVPR'19 orthogonalization; reference mmpose/models/utils/geometry.py
    rot6d_to_rotmat)."""
    n = x.shape[0]
    a = x.reshape(n * 24, 3, 2)
    b1 = a[..., 0] / jnp.maximum(
        jnp.linalg.norm(a[..., 0], axis=-1, keepdims=True), 1e-8)
    proj = jnp.sum(b1 * a[..., 1], axis=-1, keepdims=True)
    b2 = a[..., 1] - proj * b1
    b2 = b2 / jnp.maximum(jnp.linalg.norm(b2, axis=-1, keepdims=True), 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)           # [N*24, 3, 3]


def rotmat_to_quat(m):
    """[..., 3, 3] rotation matrices -> [..., 4] unit quaternions (w,x,y,z),
    w >= 0. Shepperd's largest-component extraction: each of the four
    candidate forms divides by a different 1+/-trace term; picking the
    largest keeps the divisor >= 1, so the conversion is stable for ALL
    rotations — including the 180-degree neighborhood where the skew-part
    axis extraction degenerates."""
    d0, d1, d2 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    q0 = jnp.stack([1.0 + d0 + d1 + d2,
                    m[..., 2, 1] - m[..., 1, 2],
                    m[..., 0, 2] - m[..., 2, 0],
                    m[..., 1, 0] - m[..., 0, 1]], axis=-1)
    q1 = jnp.stack([m[..., 2, 1] - m[..., 1, 2],
                    1.0 + d0 - d1 - d2,
                    m[..., 0, 1] + m[..., 1, 0],
                    m[..., 0, 2] + m[..., 2, 0]], axis=-1)
    q2 = jnp.stack([m[..., 0, 2] - m[..., 2, 0],
                    m[..., 0, 1] + m[..., 1, 0],
                    1.0 - d0 + d1 - d2,
                    m[..., 1, 2] + m[..., 2, 1]], axis=-1)
    q3 = jnp.stack([m[..., 1, 0] - m[..., 0, 1],
                    m[..., 0, 2] + m[..., 2, 0],
                    m[..., 1, 2] + m[..., 2, 1],
                    1.0 - d0 - d1 + d2], axis=-1)
    lead = jnp.stack([q0[..., 0], q1[..., 1], q2[..., 2], q3[..., 3]],
                     axis=-1)
    cand = jnp.stack([q0, q1, q2, q3], axis=-2)        # [..., 4, 4]
    idx = jnp.argmax(lead, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None], axis=-2)[..., 0, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)   # canonical w >= 0


def rot6d_to_axis_angle(x):
    """[N, 24*6] rot6d -> [N, 72] axis-angle via quaternions
    (rot6d -> rotmat -> quat -> axis-angle). The quaternion route stays
    stable near 180-degree rotations, where the previous skew-part axis
    extraction collapsed (axis norm -> 0); angle = 2*atan2(|v|, w) is
    exact and smooth over the whole rotation group."""
    n = x.shape[0]
    q = rotmat_to_quat(rot6d_to_rotmat(x))
    w, v = q[..., 0], q[..., 1:]
    vn = jnp.linalg.norm(v, axis=-1)
    angle = 2.0 * jnp.arctan2(vn, w)
    # aa = v/|v| * angle, with the analytic small-angle limit 2/w (w ~ 1
    # when |v| ~ 0); safe denominators in BOTH branches keep grads finite
    small = vn < 1e-6
    scale = jnp.where(small,
                      2.0 / jnp.maximum(w, 0.5),
                      angle / jnp.maximum(vn, 1e-6))
    return (v * scale[..., None]).reshape(n, 72)


class SMPLDiscriminator(nn.Module):
    """Pose/shape realism discriminator: per-joint heads on axis-angle
    triples, a shape head, and a full-pose head; outputs [N, 25] logits
    (23 joints + shape + full pose)."""
    hidden: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pose, shape):
        n = pose.shape[0]
        joints = pose.reshape(n, 24, 3)[:, 1:]          # skip global orient
        common = nn.relu(nn.Dense(32, dtype=self.dtype,
                                  name='joint_embed')(joints))
        per_joint = nn.Dense(1, dtype=self.dtype,
                             name='joint_out')(common)[..., 0]   # [N, 23]
        sh = nn.relu(nn.Dense(self.hidden // 4, dtype=self.dtype,
                              name='shape_fc')(shape))
        sh = nn.Dense(1, dtype=self.dtype, name='shape_out')(sh)
        full = nn.relu(nn.Dense(self.hidden, dtype=self.dtype,
                                name='full_fc')(common.reshape(n, -1)))
        full = nn.Dense(1, dtype=self.dtype, name='full_out')(full)
        return jnp.concatenate([per_joint, sh, full], axis=-1)


def project_points(joints_3d, cam):
    """Weak-perspective projection: cam = (scale, tx, ty)."""
    s = cam[:, :1, None]
    t = cam[:, None, 1:]
    return s * joints_3d[..., :2] + t


class ParametricMesh:
    """Generator (backbone + HMR head + smpl_fn) with loss utilities."""

    def __init__(self, backbone, smpl_fn: Callable, num_iters=3,
                 pose_rep='aa'):
        """pose_rep='rot6d' uses the reference head layout (24*6 rot6d,
        hmr_head.py:28) and converts to axis-angle before smpl_fn."""
        self.backbone = backbone
        self.pose_rep = pose_rep
        self.head = HMRMeshHead(num_iters=num_iters,
                                pose_dim=144 if pose_rep == 'rot6d'
                                else POSE_DIM)
        self.smpl_fn = smpl_fn

    def _pose_aa(self, pose):
        return (rot6d_to_axis_angle(pose) if self.pose_rep == 'rot6d'
                else pose)

    def init(self, rng, sample):
        bb = self.backbone.init(rng, sample)
        feat = self.backbone.apply(bb, sample)
        feat = jnp.mean(feat, axis=(1, 2))
        head = self.head.init(rng, feat, train=False)
        return {'backbone': bb, 'head': head}

    def apply(self, variables, imgs, train=False):
        feat = self.backbone.apply(variables['backbone'], imgs, train=train)
        feat = jnp.mean(feat, axis=(1, 2))
        pose, shape, cam = self.head.apply(variables['head'], feat,
                                           train=train)
        pose = self._pose_aa(pose)
        verts, joints3d = self.smpl_fn(pose, shape)
        return dict(pose=pose, shape=shape, cam=cam, vertices=verts,
                    joints_3d=joints3d,
                    joints_2d=project_points(joints3d, cam))

    def train_apply(self, variables, imgs):
        """Training-mode forward that also returns variables with advanced
        backbone BatchNorm statistics (train=True removes the running
        stats from the gradient graph, so differentiating the loss w.r.t.
        the full tree leaves them untouched by the optimizer)."""
        bb = variables['backbone']
        if 'batch_stats' in bb:
            feat, upd = self.backbone.apply(bb, imgs, train=True,
                                            mutable=['batch_stats'])
            new_bb = {**bb, **upd}
        else:
            feat = self.backbone.apply(bb, imgs, train=True)
            new_bb = bb
        feat = jnp.mean(feat, axis=(1, 2))
        pose, shape, cam = self.head.apply(variables['head'], feat,
                                           train=True)
        pose = self._pose_aa(pose)
        verts, joints3d = self.smpl_fn(pose, shape)
        out = dict(pose=pose, shape=shape, cam=cam, vertices=verts,
                   joints_3d=joints3d,
                   joints_2d=project_points(joints3d, cam))
        return out, {'backbone': new_bb, 'head': variables['head']}


def make_adversarial_train_step(mesh: ParametricMesh,
                                disc: SMPLDiscriminator, gen_tx, disc_tx,
                                w_joint2d=1.0, w_joint3d=1.0, w_adv=0.1,
                                w_disc=1.0):
    """One jit program updating generator and discriminator together
    (reference ParametricMesh.train_step, mesh.py: alternating optimizers)."""
    from .losses_regression import gan_loss, mesh_joint_loss
    import optax

    def step(gen_vars, disc_vars, gen_opt, disc_opt, batch):
        def gen_loss_fn(gv):
            # train_apply: BN uses batch statistics (running stats leave
            # the gradient graph -> zero grads/updates) and returns the
            # advanced stats, merged back after the optimizer step.
            out, new_gv = mesh.train_apply(gv, batch['imgs'])
            l2d = mesh_joint_loss(out['joints_2d'], batch['joints_2d'],
                                  batch['joints_2d_visible']) * w_joint2d
            # pelvis-centered (hips 2,3) like reference joints_3d_loss
            l3d = mesh_joint_loss(out['joints_3d'], batch['joints_3d'],
                                  batch['joints_3d_visible'],
                                  pelvis_ids=(2, 3)) * w_joint3d
            logits = disc.apply(disc_vars, out['pose'], out['shape'])
            ladv = gan_loss(logits, True, 'lsgan') * w_adv
            return l2d + l3d + ladv, dict(loss_2d=l2d, loss_3d=l3d,
                                          loss_adv=ladv, out=out,
                                          new_gv=new_gv)

        (gl, aux), ggrads = jax.value_and_grad(gen_loss_fn,
                                               has_aux=True)(gen_vars)
        gupd, gen_opt = gen_tx.update(ggrads, gen_opt, gen_vars)
        gen_vars = optax.apply_updates(gen_vars, gupd)
        gen_vars = {k: {**gen_vars[k],
                        **{c: v for c, v in aux['new_gv'][k].items()
                           if c != 'params'}}
                    for k in gen_vars}

        def disc_loss_fn(dv):
            fake = disc.apply(dv, jax.lax.stop_gradient(aux['out']['pose']),
                              jax.lax.stop_gradient(aux['out']['shape']))
            real = disc.apply(dv, batch['real_pose'], batch['real_shape'])
            return (gan_loss(real, True, 'lsgan')
                    + gan_loss(fake, False, 'lsgan')) * w_disc

        dl, dgrads = jax.value_and_grad(disc_loss_fn)(disc_vars)
        dupd, disc_opt = disc_tx.update(dgrads, disc_opt, disc_vars)
        disc_vars = optax.apply_updates(disc_vars, dupd)
        metrics = {k: v for k, v in aux.items()
                   if k not in ('out', 'new_gv')}
        metrics.update(gen_loss=gl, disc_loss=dl)
        return gen_vars, disc_vars, gen_opt, disc_opt, metrics

    return step


def linear_smpl_fn(seed=0, num_verts=689):
    """Deterministic linear SMPL surrogate: vertices/joints as a fixed
    random linear map of (pose, shape). The real SMPL basis is a licensed
    asset the reference also ships separately (mmpose/models/utils/smpl.py
    loads models/smpl/*.pkl); drop-in replace via `build_parametric_mesh`
    smpl='npz' once the basis is on disk."""
    rng = np.random.RandomState(seed)
    w_j = jnp.asarray(rng.randn(POSE_DIM + SHAPE_DIM, 24 * 3)
                      .astype(np.float32)) * 0.01
    w_v = jnp.asarray(rng.randn(POSE_DIM + SHAPE_DIM, num_verts * 3)
                      .astype(np.float32)) * 0.01

    def smpl_fn(pose, shape):
        n = pose.shape[0]
        params = jnp.concatenate([pose, shape], axis=-1)
        joints = (params @ w_j).reshape(n, 24, 3)
        verts = (params @ w_v).reshape(n, num_verts, 3)
        return verts, joints
    return smpl_fn


def npz_smpl_fn(path):
    """Linear-blend SMPL from an npz with keys J_w [82, 72] and V_w
    [82, V*3] (pre-baked linearization of the SMPL basis)."""
    data = np.load(path)
    w_j = jnp.asarray(data['J_w'], jnp.float32)
    w_v = jnp.asarray(data['V_w'], jnp.float32)

    def smpl_fn(pose, shape):
        n = pose.shape[0]
        params = jnp.concatenate([pose, shape], axis=-1)
        joints = (params @ w_j).reshape(n, 24, 3)
        verts = (params @ w_v).reshape(n, -1, 3)
        return verts, joints
    return smpl_fn


def build_parametric_mesh(mcfg: dict):
    """Config dict -> ParametricMesh (reference ParametricMesh detector,
    mesh.py:24, built by build_posenet)."""
    from ..train.loop import build_backbone
    mcfg = dict(mcfg)
    bb = build_backbone(mcfg.pop('backbone_type', 'resnet'),
                        **(mcfg.pop('backbone_overrides', None) or {}))
    smpl = mcfg.pop('smpl', 'linear')
    if isinstance(smpl, str) and smpl.endswith('.npz'):
        smpl_fn = npz_smpl_fn(smpl)
    else:
        smpl_fn = linear_smpl_fn()
    return ParametricMesh(bb, smpl_fn,
                          num_iters=mcfg.pop('num_iters', 3),
                          pose_rep=mcfg.pop('pose_rep', 'aa'))

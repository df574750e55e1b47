"""Mesh (SMPL) family: HMR head, discriminator, adversarial training with a
mock SMPL function (real SMPL assets are external)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from vitpose_tpu.models.mesh import (HMRMeshHead, SMPLDiscriminator,
                                     ParametricMesh,
                                     make_adversarial_train_step,
                                     project_points, POSE_DIM, SHAPE_DIM)
from vitpose_tpu.models.resnet import ResNet


def mock_smpl(pose, shape):
    """Linear mock: deterministic vertices/joints from params."""
    n = pose.shape[0]
    w_j = jnp.asarray(np.random.RandomState(0).randn(
        POSE_DIM + SHAPE_DIM, 24 * 3).astype(np.float32)) * 0.01
    params = jnp.concatenate([pose, shape], axis=-1)
    joints = (params @ w_j).reshape(n, 24, 3)
    verts = jnp.tile(joints[:, :1], (1, 40, 1))
    return verts, joints


def test_hmr_head_iterative():
    head = HMRMeshHead(num_iters=3, hidden=64)
    feat = jnp.ones((2, 128))
    v = head.init(jax.random.PRNGKey(0), feat, train=False)
    pose, shape, cam = head.apply(v, feat, train=False)
    assert pose.shape == (2, 72) and shape.shape == (2, 10)
    assert cam.shape == (2, 3)


def test_discriminator_logits():
    disc = SMPLDiscriminator(hidden=64)
    pose = jnp.zeros((3, 72))
    shape = jnp.zeros((3, 10))
    v = disc.init(jax.random.PRNGKey(0), pose, shape)
    out = disc.apply(v, pose, shape)
    assert out.shape == (3, 25)         # 23 joints + shape + full pose


def test_projection():
    joints = jnp.ones((2, 24, 3))
    cam = jnp.asarray([[2.0, 0.1, -0.1], [1.0, 0.0, 0.0]])
    p = project_points(joints, cam)
    assert p.shape == (2, 24, 2)
    np.testing.assert_allclose(np.asarray(p)[0, 0], [2.1, 1.9], atol=1e-5)


@pytest.mark.slow
def test_adversarial_training_step():
    rng = jax.random.PRNGKey(0)
    mesh = ParametricMesh(ResNet(depth=18), mock_smpl, num_iters=2)
    disc = SMPLDiscriminator(hidden=32)
    imgs = jax.random.normal(rng, (2, 64, 48, 3))
    gen_vars = mesh.init(rng, imgs)
    disc_vars = disc.init(rng, jnp.zeros((2, 72)), jnp.zeros((2, 10)))
    gen_tx, disc_tx = optax.adam(1e-4), optax.adam(1e-4)
    gen_opt = gen_tx.init(gen_vars)
    disc_opt = disc_tx.init(disc_vars)

    gt_pose = jnp.zeros((2, 72))
    gt_shape = jnp.zeros((2, 10))
    _, gt_joints = mock_smpl(gt_pose, gt_shape)
    batch = dict(
        imgs=imgs,
        joints_3d=gt_joints,
        joints_3d_visible=jnp.ones((2, 24)),
        joints_2d=gt_joints[..., :2],
        joints_2d_visible=jnp.ones((2, 24)),
        real_pose=gt_pose, real_shape=gt_shape)

    step = jax.jit(make_adversarial_train_step(mesh, disc, gen_tx, disc_tx))
    metrics0 = None
    for i in range(5):
        gen_vars, disc_vars, gen_opt, disc_opt, metrics = step(
            gen_vars, disc_vars, gen_opt, disc_opt, batch)
        if metrics0 is None:
            metrics0 = {k: float(v) for k, v in metrics.items()}
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert float(metrics['gen_loss']) <= metrics0['gen_loss'] * 1.5


def test_imshow_mesh_3d_renders():
    """The z-buffer rasterizer paints the projected mesh region and
    respects occlusion ordering."""
    import numpy as np
    from vitpose_tpu.api.inference import imshow_mesh_3d
    img = np.zeros((64, 64, 3), np.uint8)
    # two triangles at different depths covering the image center
    near = np.array([[-0.2, -0.2, 2.0], [0.2, -0.2, 2.0], [0.0, 0.3, 2.0]],
                    np.float32)
    far = near.copy()
    far[:, 2] = 4.0
    faces = np.array([[0, 1, 2]])
    out = imshow_mesh_3d(img, [far, near], [faces, faces], (32, 32),
                         (64, 64), colors=[(255, 0, 0), (0, 255, 0)])
    center = out[32, 32]
    assert center[1] > 100 and center[0] < 50, center   # near (green) wins
    assert (out != 0).any()

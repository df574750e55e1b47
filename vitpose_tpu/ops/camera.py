"""Pinhole camera model with distortion, pure jnp (batched).

Counterpart of the reference camera module
(mmpose/core/camera/single_camera.py:8 `SimpleCamera` /
`SimpleCameraTorch`): world<->camera rigid transforms and camera->pixel
projection with radial (k1..k6-style truncated to k3) + tangential (p1, p2)
distortion. All functions vmap/jit-ready; parameters follow the reference's
dict convention (R [3,3], T [3,1], f [2,1], c [2,1], k [3|6], p [2]).
"""
from __future__ import annotations

import jax.numpy as jnp


class SimpleCamera:
    """Camera parametrized like the reference SimpleCamera."""

    def __init__(self, param: dict):
        self.R = jnp.asarray(param['R'], jnp.float32)          # [3, 3]
        self.T = jnp.asarray(param['T'], jnp.float32).reshape(1, 3)
        f = jnp.asarray(param['f'], jnp.float32).reshape(2)
        c = jnp.asarray(param['c'], jnp.float32).reshape(2)
        self.f = f
        self.c = c
        self.K = jnp.array([[f[0], 0, c[0]], [0, f[1], c[1]], [0, 0, 1]],
                           jnp.float32)
        self.has_dist = 'k' in param and 'p' in param
        if self.has_dist:
            self.k = jnp.asarray(param['k'], jnp.float32).reshape(-1)
            self.p = jnp.asarray(param['p'], jnp.float32).reshape(-1)

    def world_to_camera(self, x):
        """[..., 3] world -> camera coords (reference: X_cam = R(X - T)...
        mmpose convention: x @ R.T + T)."""
        return x @ self.R.T + self.T

    def camera_to_world(self, x):
        return (x - self.T) @ jnp.linalg.inv(self.R).T

    def camera_to_pixel(self, x):
        """[..., 3] camera coords -> [..., 2] pixels with distortion
        (parity: single_camera.py SimpleCamera.camera_to_pixel)."""
        v = x[..., :2] / x[..., 2:]
        if self.has_dist:
            k, p = self.k, self.p
            r2 = jnp.sum(v ** 2, axis=-1)
            radial = 1.0 + sum(ki * r2 ** (i + 1)
                               for i, ki in enumerate(k[:3]))
            if k.shape[0] == 6:
                radial = radial / (1.0 + sum(
                    ki * r2 ** (i + 1) for i, ki in enumerate(k[3:])))
            tangential = 2.0 * (p[1] * v[..., 0] + p[0] * v[..., 1])
            v = (v * (radial + tangential)[..., None]
                 + jnp.stack([p[1], p[0]]) * r2[..., None])
        return v * self.f + self.c

    def pixel_to_camera(self, x):
        """[..., 3] (u, v, depth) -> camera coords (no distortion inverse,
        like the reference)."""
        z = x[..., 2:]
        uv = (x[..., :2] - self.c) / self.f * z
        return jnp.concatenate([uv, z], axis=-1)

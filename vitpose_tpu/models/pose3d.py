"""3D pose lifting: TCN backbone + temporal regression head + PoseLifter.

Counterparts of the reference 2D->3D lifting stack
(mmpose/models/backbones/tcn.py:133 `TCN`,
 mmpose/models/heads/temporal_regression_head.py:13 `TemporalRegressionHead`,
 mmpose/models/detectors/pose_lifter.py `PoseLifter`):

  * TCN consumes a [N, T, K*2] sequence of 2D keypoints; temporal dilated
    convolutions shrink T to 1 receptive field, producing [N, C] features.
    NWC layout (sequence as the spatial axis of a 1D conv) — MXU-friendly.
  * TemporalRegressionHead maps features to [N, K, 3] root-relative 3D
    joints, with optional global-position restoration at decode.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class TCN(nn.Module):
    """Temporal dilated conv network over keypoint sequences.

    in: [N, T, C_in] (C_in = num_keypoints * 2). Receptive field =
    kernel^n_blocks; T must equal the receptive field for full reduction.
    """
    stem_channels: int = 1024
    kernel_sizes: Sequence[int] = (3, 3, 3)
    dropout: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.stem_channels
        k0 = self.kernel_sizes[0]
        x = nn.Conv(c, (k0,), padding='VALID', use_bias=False,
                    dtype=self.dtype, name='stem_conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='stem_bn')(x)
        x = nn.relu(x)
        if train and self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=False)(x)

        dilation = k0
        for i, k in enumerate(self.kernel_sizes[1:]):
            # symmetric residual crop of pad = (k-1)*dilation//2 from EACH
            # side (reference tcn.py:117-123 BasicTemporalBlock.forward)
            pad = (k - 1) * dilation // 2
            res = x[:, pad:x.shape[1] - pad, :]
            y = nn.Conv(c, (k,), kernel_dilation=(dilation,),
                        padding='VALID', use_bias=False, dtype=self.dtype,
                        name=f'block{i}_conv1')(x)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f'block{i}_bn1')(y)
            y = nn.relu(y)
            if train and self.dropout > 0:
                y = nn.Dropout(self.dropout, deterministic=False)(y)
            y = nn.Conv(c, (1,), use_bias=False, dtype=self.dtype,
                        name=f'block{i}_conv2')(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f'block{i}_bn2')(y)
            y = nn.relu(y)
            if train and self.dropout > 0:
                y = nn.Dropout(self.dropout, deterministic=False)(y)
            x = res + y
            dilation *= k
        return x                                        # [N, T', C]


class TemporalRegressionHead(nn.Module):
    """[N, T', C] -> [N, K, 3] root-relative 3D joints."""
    num_joints: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # center frame (T' is 1 after full receptive-field reduction)
        x = x[:, x.shape[1] // 2, :]
        out = nn.Dense(self.num_joints * 3, dtype=self.dtype,
                       name='fc')(x)
        return out.reshape(-1, self.num_joints, 3)


class PoseLifter(nn.Module):
    """2D keypoint sequence -> 3D pose (reference pose_lifter.py).

    With ``with_traj=True`` a parallel trajectory branch (its own TCN +
    1-joint regression head, reference pose_lifter.py:73-82 and the
    VideoPose3D semi-supervised config's traj_backbone/traj_head) predicts
    the global root position; ``__call__`` then returns
    ``(pose [N, K, 3], traj [N, 1, 3])`` for use with
    ``losses_regression.semi_supervision_loss``."""
    num_joints: int = 17
    stem_channels: int = 1024
    kernel_sizes: Sequence[int] = (3, 3, 3)
    with_traj: bool = False
    dropout: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @property
    def receptive_field(self):
        rf = 1
        for k in self.kernel_sizes:
            rf *= k
        return rf

    @nn.compact
    def __call__(self, kp2d_seq, train: bool = False):
        """kp2d_seq: [N, T, K, 2] -> [N, K, 3] (or (pose, traj))."""
        n, t, k, _ = kp2d_seq.shape
        x = kp2d_seq.reshape(n, t, k * 2).astype(self.dtype)
        feat = TCN(self.stem_channels, self.kernel_sizes,
                   dropout=self.dropout, dtype=self.dtype,
                   name='backbone')(x, train=train)
        pose = TemporalRegressionHead(self.num_joints, dtype=self.dtype,
                                      name='head')(feat, train=train)
        if not self.with_traj:
            return pose
        tfeat = TCN(self.stem_channels, self.kernel_sizes,
                    dropout=self.dropout, dtype=self.dtype,
                    name='traj_backbone')(x, train=train)
        traj = TemporalRegressionHead(1, dtype=self.dtype,
                                      name='traj_head')(tfeat, train=train)
        return pose, traj


def decode_pose3d(output, target_root=None):
    """Restore global positions from root-relative predictions
    (reference temporal_regression_head.py:225 decode with
    restore_global_position)."""
    output = np.asarray(output)
    if target_root is not None:
        output = output + np.asarray(target_root)[:, None, :]
    return output

"""Pure-jnp batched geometry for top-down pose estimation.

Design notes (TPU-first):
  * Everything is batched over a leading N axis with static shapes, so all
    functions are `jit`/`vmap` friendly and run fully on device.
  * The classic mmpose affine (reference:
    mmpose/core/post_processing/post_transforms.py:197 `get_affine_transform`)
    builds the matrix from a 3-point cv2 solve. The transform is in fact a
    similarity (rotation + uniform scale + translation), so we construct it in
    closed form instead — no linear solves, no host round-trips.
  * `pixel_std = 200.0` is the mmpose bbox-scale normalisation convention
    (reference: top_down_transform.py:13 `bbox_xywh2cs`); kept for checkpoint &
    annotation compatibility.

Behavioral parity targets (golden-tested in tests/test_golden_geometry.py):
  reference post_transforms.py: get_affine_transform, get_warp_matrix,
  transform_preds, fliplr_joints, flip_back.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

PIXEL_STD = 200.0


# ---------------------------------------------------------------------------
# bbox conversions
# ---------------------------------------------------------------------------

def bbox_xywh2cs(bbox, aspect_ratio, padding=1.25, pixel_std=PIXEL_STD):
    """Convert [..., 4] xywh boxes to (center[...,2], scale[...,2]).

    The box is symmetrically grown to the requested aspect ratio (w/h), then
    normalised by ``pixel_std`` and padded.
    Parity: reference top_down_transform.py:13.

    Host callers (the data loader calls this once per record) get plain
    numpy math — a per-record jnp dispatch costs ~ms and throttles the
    input pipeline; jit/device callers trace the jnp path unchanged.
    """
    xp = np if isinstance(bbox, (np.ndarray, list, tuple)) else jnp
    bbox = xp.asarray(bbox, np.float32)
    x, y, w, h = bbox[..., 0], bbox[..., 1], bbox[..., 2], bbox[..., 3]
    center = xp.stack([x + w * 0.5, y + h * 0.5], axis=-1)
    # grow to target aspect ratio
    h_fit = xp.where(w > aspect_ratio * h, w / aspect_ratio, h)
    w_fit = xp.where(w < aspect_ratio * h, h * aspect_ratio, w)
    scale = xp.stack([w_fit, h_fit], axis=-1) / pixel_std * padding
    return center, scale


def bbox_xyxy2xywh(bbox):
    """[..., 4+] xyxy(+score) -> xywh(+score)."""
    bbox = jnp.asarray(bbox, jnp.float32)
    wh = bbox[..., 2:4] - bbox[..., :2]
    return jnp.concatenate([bbox[..., :2], wh, bbox[..., 4:]], axis=-1)


def bbox_cs2xyxy(center, scale, pixel_std=PIXEL_STD):
    """Inverse of bbox_xywh2cs (without padding removal)."""
    wh = jnp.asarray(scale, jnp.float32) * pixel_std
    xy = jnp.asarray(center, jnp.float32) - wh * 0.5
    return jnp.concatenate([xy, xy + wh], axis=-1)


# ---------------------------------------------------------------------------
# affine construction
# ---------------------------------------------------------------------------

def affine_matrix(center, scale, rot_deg, output_size, shift=(0.0, 0.0),
                  inv=False, pixel_std=PIXEL_STD):
    """Batched classic (MSRA) crop affine, closed form.

    Maps the source box (center, scale*pixel_std, rotated by ``rot_deg``) onto
    an ``output_size = (w, h)`` canvas. Only ``scale[..., 0]`` (the width)
    determines the zoom, exactly like the reference 3-point construction
    (post_transforms.py:197-252); the aspect ratio was already fixed upstream
    by :func:`bbox_xywh2cs`.

    Args:
      center: [..., 2] box centers (x, y).
      scale:  [..., 2] normalised box scales.
      rot_deg: [...] rotation angles in degrees (broadcastable).
      output_size: static (w, h) of the destination canvas.
      shift: static (sx, sy) translation as a fraction of the source box.
      inv: if True, return the dst->src matrix instead.

    Returns:
      [..., 2, 3] affine matrices (dst <- src, or src <- dst when ``inv``).
    """
    center = jnp.asarray(center, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    rot = jnp.deg2rad(jnp.asarray(rot_deg, jnp.float32))
    dst_w, dst_h = float(output_size[0]), float(output_size[1])

    src_wh = scale * pixel_std                       # [..., 2]
    src_w = src_wh[..., 0]
    s = dst_w / src_w                                # uniform zoom
    cos, sin = jnp.cos(rot), jnp.sin(rot)
    # The 3-point construction maps the rotated source frame onto the upright
    # destination frame; equivalently A = s * R(-rot).
    a00 = s * cos
    a01 = s * sin
    a10 = -s * sin
    a11 = s * cos
    p0x = center[..., 0] + src_wh[..., 0] * shift[0]
    p0y = center[..., 1] + src_wh[..., 1] * shift[1]
    t0 = dst_w * 0.5 - (a00 * p0x + a01 * p0y)
    t1 = dst_h * 0.5 - (a10 * p0x + a11 * p0y)
    fwd = jnp.stack([
        jnp.stack([a00, a01, t0], axis=-1),
        jnp.stack([a10, a11, t1], axis=-1),
    ], axis=-2)
    if inv:
        return invert_affine(fwd)
    return fwd


def invert_affine(mat):
    """Invert [..., 2, 3] affine matrices analytically."""
    a = mat[..., :, :2]                              # [..., 2, 2]
    t = mat[..., :, 2]                               # [..., 2]
    det = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    inv00 = a[..., 1, 1] / det
    inv01 = -a[..., 0, 1] / det
    inv10 = -a[..., 1, 0] / det
    inv11 = a[..., 0, 0] / det
    it0 = -(inv00 * t[..., 0] + inv01 * t[..., 1])
    it1 = -(inv10 * t[..., 0] + inv11 * t[..., 1])
    return jnp.stack([
        jnp.stack([inv00, inv01, it0], axis=-1),
        jnp.stack([inv10, inv11, it1], axis=-1),
    ], axis=-2)


def udp_warp_matrix(rot_deg, center, scale, output_size, pixel_std=PIXEL_STD):
    """Batched UDP (unbiased) crop affine.

    Implements the unit-length pixel-grid convention of UDP (Huang et al.,
    CVPR'20): the source ROI of size ``scale*pixel_std`` centered at ``center``
    maps onto the ``output_size - 1`` grid. Parity with reference
    post_transforms.py:312 `get_warp_matrix` called as
    ``get_warp_matrix(r, c*2, image_size-1, s*200)`` (top_down_transform.py:323).

    Args:
      rot_deg: [...] rotation in degrees.
      center: [..., 2] ROI centers.
      scale:  [..., 2] normalised ROI scales.
      output_size: static (w, h) of the destination canvas (in pixels; the
        grid spans output_size-1 units).

    Returns: [..., 2, 3] dst <- src affine matrices.
    """
    center = jnp.asarray(center, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    theta = jnp.deg2rad(jnp.asarray(rot_deg, jnp.float32))
    size_input = center * 2.0                        # [..., 2]
    size_dst = jnp.array([output_size[0] - 1.0, output_size[1] - 1.0],
                         jnp.float32)
    size_target = scale * pixel_std                  # [..., 2]

    cos, sin = jnp.cos(theta), jnp.sin(theta)
    scale_x = size_dst[0] / size_target[..., 0]
    scale_y = size_dst[1] / size_target[..., 1]
    m00 = cos * scale_x
    m01 = -sin * scale_x
    m02 = scale_x * (-0.5 * size_input[..., 0] * cos +
                     0.5 * size_input[..., 1] * sin +
                     0.5 * size_target[..., 0])
    m10 = sin * scale_y
    m11 = cos * scale_y
    m12 = scale_y * (-0.5 * size_input[..., 0] * sin -
                     0.5 * size_input[..., 1] * cos +
                     0.5 * size_target[..., 1])
    return jnp.stack([
        jnp.stack([m00, m01, m02], axis=-1),
        jnp.stack([m10, m11, m12], axis=-1),
    ], axis=-2)


def apply_affine_to_points(points, mat):
    """Apply [..., 2, 3] affines to [..., K, 2] points -> [..., K, 2]."""
    points = jnp.asarray(points, jnp.float32)
    a = mat[..., :, :2]                              # [..., 2, 2]
    t = mat[..., :, 2]                               # [..., 2]
    # HIGHEST: on TPU the default f32 einsum multiplies in bf16, which
    # would cost whole pixels on image-scale coordinates
    return jnp.einsum('...ij,...kj->...ki', a, points,
                      precision=jax.lax.Precision.HIGHEST) + t[..., None, :]


# ---------------------------------------------------------------------------
# prediction un-mapping (heatmap grid -> source image)
# ---------------------------------------------------------------------------

def transform_preds(coords, center, scale, output_size, use_udp=False,
                    pixel_std=PIXEL_STD):
    """Map [..., K, 2] heatmap-grid coords back to source-image space.

    ``output_size`` is the static heatmap (w, h). Under UDP the grid spans
    ``size - 1`` units (parity: post_transforms.py:150-194).
    Batched over any leading dims of center/scale ([..., 2]).
    """
    coords = jnp.asarray(coords, jnp.float32)
    center = jnp.asarray(center, jnp.float32)
    scale_px = jnp.asarray(scale, jnp.float32) * pixel_std
    w, h = float(output_size[0]), float(output_size[1])
    if use_udp:
        denom = jnp.array([w - 1.0, h - 1.0], jnp.float32)
    else:
        denom = jnp.array([w, h], jnp.float32)
    factor = scale_px / denom                        # [..., 2]
    origin = center - scale_px * 0.5                 # [..., 2]
    return coords * factor[..., None, :] + origin[..., None, :]


# ---------------------------------------------------------------------------
# horizontal flips
# ---------------------------------------------------------------------------

def flip_index_from_pairs(flip_pairs, num_joints):
    """Build a length-K permutation (numpy, host-side) from mirror pairs."""
    idx = np.arange(num_joints)
    for a, b in flip_pairs:
        idx[a], idx[b] = b, a
    return idx


def fliplr_joints(joints, visible, img_width, flip_index):
    """Mirror [..., K, C>=2] joints horizontally (training-time flip aug).

    ``flip_index`` is the precomputed permutation from
    :func:`flip_index_from_pairs`. Coordinates become ``W - 1 - x`` and the
    result is masked by visibility (parity: post_transforms.py:13-51).
    """
    joints = jnp.asarray(joints, jnp.float32)[..., flip_index, :]
    visible = jnp.asarray(visible, jnp.float32)[..., flip_index, :]
    x = img_width - 1 - joints[..., 0:1]
    joints = jnp.concatenate([x, joints[..., 1:]], axis=-1) * visible
    return joints, visible


def flip_back(heatmaps, flip_index, target_type='GaussianHeatmap'):
    """Un-flip heatmaps produced from a horizontally flipped input.

    heatmaps: [N, K, H, W] (or [N, 3K, H, W] for CombinedTarget).
    Channel permutation + horizontal reversal; for CombinedTarget the
    x-offset channels are negated (parity: post_transforms.py:110-147).
    """
    heatmaps = jnp.asarray(heatmaps)
    if target_type.lower() == 'combinedtarget':
        n, c3, h, w = heatmaps.shape
        hm = heatmaps.reshape(n, c3 // 3, 3, h, w)
        hm = hm.at[:, :, 1].multiply(-1.0)
        hm = hm[:, flip_index]
        heatmaps = hm.reshape(n, c3, h, w)
    else:
        heatmaps = heatmaps[:, flip_index]
    return heatmaps[..., ::-1]


def fliplr_regression(regression, flip_pairs, center_mode='static',
                      center_x=0.5, center_index=0):
    """Flip regressed keypoint coordinates horizontally (reference
    post_transforms.py:54): swap left/right pairs, then mirror x around a
    static x (normalized coords) or a root joint's x."""
    regression = jnp.asarray(regression)
    assert regression.ndim >= 2, regression.shape
    if center_mode == 'static':
        x_c = center_x
    elif center_mode == 'root':
        x_c = regression[..., center_index:center_index + 1, 0]
    else:
        raise ValueError(center_mode)
    idx = jnp.arange(regression.shape[-2])
    for a, b in flip_pairs:
        idx = idx.at[a].set(b).at[b].set(a)
    out = regression[..., idx, :]
    return out.at[..., 0].set(x_c * 2 - out[..., 0])

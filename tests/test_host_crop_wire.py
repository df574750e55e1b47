"""Host-crop wire format (bench_train BENCH_E2E_MODE=crop): the split
host-warp + device-finish pipeline must agree with the fused on-device
make_preprocess_fn up to uint8 crop quantization (the reference's own
wire format is cv2-warped uint8 crops from dataloader workers,
top_down_transform.py TopDownAffine)."""
import numpy as np


def test_host_crop_matches_device_preprocess():
    import jax.numpy as jnp
    from vitpose_tpu.data.pipeline import (make_device_finish_fn,
                                           make_host_crop_fn,
                                           make_preprocess_fn)

    rng = np.random.RandomState(0)
    n, k = 3, 17
    imgs = rng.randint(0, 256, (n, 320, 320, 3)).astype(np.uint8)
    center = np.asarray([[160, 160], [150, 170], [170, 150]], np.float32)
    scale = np.full((n, 2), 1.5, np.float32)
    rot = np.asarray([0.0, 15.0, -30.0], np.float32)
    joints = rng.uniform(80, 240, (n, k, 2)).astype(np.float32)
    vis = np.ones((n, k), np.float32)
    flip = np.asarray([False, True, False])

    fused = make_preprocess_fn(image_size=(192, 256),
                               heatmap_size=(48, 64))
    ref = fused(jnp.asarray(imgs), center, scale, rot, joints, vis, flip)

    host_crop = make_host_crop_fn(image_size=(192, 256))
    finish = make_device_finish_fn(image_size=(192, 256),
                                   heatmap_size=(48, 64))
    crops, joints_c = host_crop(jnp.asarray(imgs), center, scale, rot,
                                joints, flip)
    out = finish(crops, joints_c, vis)

    # crops agree up to the uint8 wire quantization (1/255 in normalized
    # units, scaled by 1/std)
    np.testing.assert_allclose(np.asarray(out['imgs']),
                               np.asarray(ref['imgs']), atol=2.5 / 255 / 0.2)
    # joints/targets are exact (computed from the same affine)
    np.testing.assert_allclose(np.asarray(out['target']),
                               np.asarray(ref['target']), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out['target_weight']),
                               np.asarray(ref['target_weight']), atol=0)

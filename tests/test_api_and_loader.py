"""API + data loader integration tests on the reference COCO fixture."""
import numpy as np
import pytest

REF = "/root/reference/tests/data/coco"


@pytest.fixture(scope="module")
def tiny_pose_model():
    from vitpose_tpu.api import init_pose_model
    from vitpose_tpu.models import make_config
    from vitpose_tpu.models.vit import ViTConfig
    cfg = make_config('s', img_size=(256, 192), out_channels=17)
    cfg = cfg.__class__(**{**cfg.__dict__,
                           'backbone': ViTConfig(img_size=(256, 192),
                                                 embed_dim=32, depth=2,
                                                 num_heads=4),
                           'deconv_filters': (16, 16)})
    return init_pose_model(cfg)


def test_inference_top_down_api(tiny_pose_model):
    from vitpose_tpu.api import inference_top_down_pose_model
    person_results = [{'bbox': [280.8, 44.7, 218.7, 346.7, 0.99]},
                      {'bbox': [10.0, 10.0, 100.0, 200.0, 0.9]}]
    pose_results, _ = inference_top_down_pose_model(
        tiny_pose_model, f"{REF}/000000000785.jpg", person_results)
    assert len(pose_results) == 2
    kp = pose_results[0]['keypoints']
    assert kp.shape == (17, 3)
    assert np.isfinite(kp).all()
    # keypoints land inside (padded) box of the first person
    assert kp[:, 0].min() > 280.8 - 100 and kp[:, 0].max() < 499.5 + 100


def test_inference_bbox_thr_and_xyxy(tiny_pose_model):
    from vitpose_tpu.api import inference_top_down_pose_model
    person_results = [{'bbox': [280, 44, 499, 391, 0.99]},
                      {'bbox': [10, 10, 110, 210, 0.1]}]
    pose_results, _ = inference_top_down_pose_model(
        tiny_pose_model, f"{REF}/000000000785.jpg", person_results,
        bbox_thr=0.5, format='xyxy')
    assert len(pose_results) == 1


def test_vis_pose_result(tiny_pose_model, tmp_path):
    from vitpose_tpu.api import (inference_top_down_pose_model,
                                 vis_pose_result)
    pose_results, _ = inference_top_down_pose_model(
        tiny_pose_model, f"{REF}/000000000785.jpg",
        [{'bbox': [280.8, 44.7, 218.7, 346.7]}])
    out = str(tmp_path / "vis.jpg")
    img = vis_pose_result(tiny_pose_model, f"{REF}/000000000785.jpg",
                          pose_results, kpt_score_thr=0.0, out_file=out)
    assert img is not None and img.ndim == 3
    import os
    assert os.path.exists(out)


def test_loader_train_batches():
    from vitpose_tpu.data import TopDownDataset
    from vitpose_tpu.data.loader import TopDownLoader
    ds = TopDownDataset(f"{REF}/test_coco.json", REF + "/",
                        dataset_info='coco')
    loader = TopDownLoader(ds, batch_size=4, is_train=True, canvas_size=640,
                           num_workers=2, seed=0)
    batches = list(loader)
    assert len(batches) == len(ds) // 4
    b = batches[0]
    assert b['imgs'].shape == (4, 640, 640, 3) and b['imgs'].dtype == np.uint8
    assert b['center'].shape == (4, 2)
    assert b['joints'].shape == (4, 17, 2)
    # determinism: same seed+epoch -> identical batches
    loader2 = TopDownLoader(ds, batch_size=4, is_train=True, canvas_size=640,
                            num_workers=2, seed=0)
    b2 = next(iter(loader2))
    np.testing.assert_array_equal(b['imgs'], b2['imgs'])
    np.testing.assert_allclose(b['center'], b2['center'])


def test_loader_device_pipeline_end_to_end():
    from vitpose_tpu.data import TopDownDataset
    from vitpose_tpu.data.loader import TopDownLoader
    from vitpose_tpu.data.pipeline import make_preprocess_fn
    ds = TopDownDataset(f"{REF}/test_coco.json", REF + "/",
                        dataset_info='coco')
    loader = TopDownLoader(ds, batch_size=4, is_train=True, num_workers=2)
    pre = make_preprocess_fn(image_size=(192, 256), heatmap_size=(48, 64),
                             use_udp=True, sigma=2.0)
    b = next(iter(loader))
    out = pre(b['imgs'], b['center'], b['scale'], b['rot'], b['joints'],
              b['vis'])
    assert out['imgs'].shape == (4, 256, 192, 3)
    assert out['target'].shape == (4, 17, 64, 48)
    assert out['target_weight'].shape == (4, 17)
    t = np.asarray(out['target'])
    w = np.asarray(out['target_weight'])
    # visible joints produce peaked gaussians
    assert t[w > 0.5].max() > 0.9
    # eval-mode loader: no augmentation, rot == 0
    val_loader = TopDownLoader(ds, batch_size=4, is_train=False,
                               num_workers=2)
    vb = next(iter(val_loader))
    assert np.all(vb['rot'] == 0)


def test_loader_process_sharding():
    from vitpose_tpu.data import TopDownDataset
    from vitpose_tpu.data.loader import TopDownLoader
    ds = TopDownDataset(f"{REF}/test_coco.json", REF + "/",
                        dataset_info='coco')
    l0 = TopDownLoader(ds, batch_size=2, is_train=False, process_index=0,
                       process_count=2, num_workers=1)
    l1 = TopDownLoader(ds, batch_size=2, is_train=False, process_index=1,
                       process_count=2, num_workers=1)
    ids0 = [i for b in l0 for i in b['bbox_id'][b['valid']]]
    ids1 = [i for b in l1 for i in b['bbox_id'][b['valid']]]
    assert len(ids0) + len(ids1) >= len(ds) - 1


def test_inference_return_heatmap_and_outputs(tiny_pose_model):
    """reference apis/inference.py:295 parity: return_heatmap fills
    returned_outputs with the (flip-averaged) heatmaps; `outputs` captures
    named submodule intermediates (OutputHook counterpart); `dataset=`
    (deprecated class-name selector) still resolves metadata."""
    import warnings
    from vitpose_tpu.api import inference_top_down_pose_model

    img = (np.random.RandomState(3).rand(100, 120, 3) * 255).astype(np.uint8)
    boxes = [{'bbox': [5, 5, 80, 90]}]
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        pose, outs = inference_top_down_pose_model(
            tiny_pose_model, img, boxes, return_heatmap=True,
            outputs=['backbone'], dataset='TopDownCocoDataset')
        assert any(issubclass(x.category, DeprecationWarning) for x in w)
    assert len(pose) == 1 and pose[0]['keypoints'].shape[1] == 3
    assert len(outs) == 1
    hm = outs[0]['heatmap']
    assert hm.shape[0] == 1 and hm.shape[1] == 17
    assert outs[0]['backbone'].ndim == 4        # [N, Hp, Wp, C] tokens
    assert set(outs[0]) == {'heatmap', 'backbone'}

    # no flags -> returned_outputs stays empty (cheap path unchanged)
    pose2, outs2 = inference_top_down_pose_model(tiny_pose_model, img, boxes)
    assert outs2 == []
    np.testing.assert_allclose(pose[0]['keypoints'], pose2[0]['keypoints'],
                               atol=1e-4)


def test_inference_dataset_info_drives_flip_pairs(tiny_pose_model):
    """Per-call dataset_info must change the in-jit flip test's channel
    un-permutation (the reference resolves flip_pairs from the dataset
    argument, apis/inference.py:163-242) — previously the resolved info
    was dead and COCO pairs were always used."""
    from vitpose_tpu.api import inference_top_down_pose_model
    from vitpose_tpu.data.dataset_info import DatasetInfo

    img = (np.random.RandomState(5).rand(90, 110, 3) * 255).astype(np.uint8)
    boxes = [{'bbox': [10, 10, 70, 70]}]
    pose_coco, _ = inference_top_down_pose_model(tiny_pose_model, img, boxes)

    # identity-flip metadata: same K, no swaps -> different flip average
    import types
    info = DatasetInfo.load('coco')
    ident = types.SimpleNamespace(num_joints=info.num_joints,
                                  flip_index=list(range(info.num_joints)))
    pose_ident, _ = inference_top_down_pose_model(
        tiny_pose_model, img, boxes, dataset_info=ident)
    assert pose_coco[0]['keypoints'].shape == pose_ident[0]['keypoints'].shape
    assert not np.allclose(pose_coco[0]['keypoints'],
                           pose_ident[0]['keypoints'], atol=1e-6)


@pytest.mark.parametrize('use_udp', [True, False])
def test_train_flip_matches_reference_source_flip(use_udp):
    """The device-side crop-frame flip (make_preprocess_fn flip=) must be
    equivalent to the reference TopDownRandomFlip semantics: flip the
    SOURCE image, mirror center/joints around W-1, reorder channels
    (top_down_transform.py:122). Guards the round-2 regression where
    flipped samples trained on unflipped pixels."""
    from vitpose_tpu.data.pipeline import make_preprocess_fn
    from vitpose_tpu.data.dataset_info import DatasetInfo

    rng = np.random.RandomState(11)
    W = 96
    canvas = (rng.rand(1, W, W, 3) * 255).astype(np.uint8)
    info = DatasetInfo.load('coco')
    fi = np.asarray(info.flip_index)
    joints = (rng.rand(1, 17, 2) * 60 + 10).astype(np.float32)
    vis = np.ones((1, 17), np.float32)
    center = np.array([[45.0, 50.0]], np.float32)
    scale = np.array([[0.35, 0.45]], np.float32)
    rot = np.zeros(1, np.float32)

    rot = np.full(1, 15.0, np.float32)     # exactness incl. rotation
    pre = make_preprocess_fn(image_size=(48, 64), heatmap_size=(12, 16),
                             use_udp=use_udp, sigma=2.0)

    # host flip semantics (sample_augmentations): mirror center/joints
    # around the canvas width, reorder channels; device folds the SOURCE
    # pixel mirror into the warp matrix via flip=True
    center_f = center.copy()
    center_f[0, 0] = W - center[0, 0] - 1
    joints_f = joints[:, fi].copy()
    joints_f[..., 0] = W - 1 - joints_f[..., 0]
    ours = pre(canvas, center_f, scale, rot, joints_f, vis[:, fi],
               np.array([True]))

    # reference semantics: actually flip the source pixels
    ref = pre(canvas[:, :, ::-1, :], center_f, scale, rot, joints_f,
              vis[:, fi])

    np.testing.assert_allclose(np.asarray(ours['imgs']),
                               np.asarray(ref['imgs']), atol=5e-4)
    np.testing.assert_allclose(np.asarray(ours['target']),
                               np.asarray(ref['target']), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours['target_weight']),
                               np.asarray(ref['target_weight']), atol=0)
    # and the flip actually changes the crop vs ignoring the flag
    plain = pre(canvas, center_f, scale, rot, joints_f, vis[:, fi])
    assert not np.allclose(np.asarray(ours['imgs']),
                           np.asarray(plain['imgs']), atol=1e-3)


def test_loader_shard_padding_more_processes_than_records():
    """Wrap-around shard padding must tile (np.resize), not single-slice:
    3 records over 8 processes leaves no shard empty."""
    from vitpose_tpu.data import TopDownDataset
    from vitpose_tpu.data.loader import TopDownLoader

    ds = TopDownDataset(f"{REF}/test_coco.json", f"{REF}/",
                        dataset_info='coco', image_size=(48, 64),
                        heatmap_size=(12, 16), test_mode=True,
                        use_gt_bbox=True)
    n = min(3, len(ds.db))
    ds.db = ds.db[:n]
    for pi in range(8):
        loader = TopDownLoader(ds, batch_size=2, is_train=False,
                               process_index=pi, process_count=8,
                               num_workers=1)
        idx = loader._indices()
        assert len(idx) >= 1, (pi, idx)
        batches = list(loader)
        assert batches and batches[0]['imgs'].shape[0] == 2

"""The full reference `mmpose.apis` export surface: interhand/mesh
inference APIs, 3D/tracking visualization, seed broadcast, and export
completeness (reference mmpose/apis/__init__.py)."""
import numpy as np
import pytest


def test_api_exports_match_reference_surface():
    import vitpose_tpu.api as A
    # the reference exports 17 names; multi/single_gpu_test map to
    # run_validation/collect_results (same capability, TPU-native names)
    reference_names = {
        'train_model', 'init_pose_model', 'inference_top_down_pose_model',
        'inference_bottom_up_pose_model', 'vis_pose_result', 'get_track_id',
        'vis_pose_tracking_result', 'inference_pose_lifter_model',
        'vis_3d_pose_result', 'inference_interhand_3d_model',
        'extract_pose_sequence', 'inference_mesh_model',
        'vis_3d_mesh_result', 'process_mmdet_results', 'init_random_seed'}
    for name in reference_names:
        assert hasattr(A, name), name
    assert hasattr(A, 'run_validation') and hasattr(A, 'collect_results')


def _rand_img(h=128, w=96):
    rng = np.random.RandomState(3)
    return rng.randint(0, 255, (h, w, 3), np.uint8)


def test_inference_interhand_3d_model():
    import jax
    import jax.numpy as jnp
    from vitpose_tpu.models.interhand3d import Interhand3DEstimator
    from vitpose_tpu.models.vit import ViTConfig
    from vitpose_tpu.api import inference_interhand_3d_model

    est = Interhand3DEstimator(
        ViTConfig(img_size=(64, 64), embed_dim=32, depth=2, num_heads=4),
        num_joints=42, depth_size=8, heatmap_size=(16, 16))
    variables = est.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    det = [{'bbox': [10, 10, 60, 80]}, {'bbox': [0, 0, 40, 40, 0.9]}]
    res = inference_interhand_3d_model((est, variables), _rand_img(), det)
    assert len(res) == 2
    for r in res:
        kp = r['keypoints_3d']
        assert kp.shape == (42, 4) and np.isfinite(kp).all()
        assert r['hand_type'].shape == (2,)
        # xyxy bbox packing
        assert r['bbox'][2] > r['bbox'][0] and r['bbox'][3] > r['bbox'][1]
    # left-hand score gated by hand_type prob (reference packing)
    ht = res[0]['hand_type']
    assert res[0]['keypoints_3d'][21:, 3].max() <= ht[1] + 1e-6

    # bbox_thr filters
    res2 = inference_interhand_3d_model((est, variables), _rand_img(), det,
                                        bbox_thr=0.95)
    assert len(res2) == 1          # only the score-1.0 default survives
    assert inference_interhand_3d_model((est, variables), _rand_img(),
                                        []) == []


def _mock_smpl():
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    verts = rng.randn(48, 3).astype(np.float32) * 0.3
    faces = np.array([[i, (i + 1) % 48, (i + 2) % 48] for i in range(46)],
                     np.int64)
    w = jnp.asarray(rng.randn(82, 48 * 3).astype(np.float32) * 1e-3)

    def smpl_fn(pose, shape):
        params = jnp.concatenate([pose, shape], axis=-1)
        offs = (params @ w).reshape(-1, 48, 3)
        v = jnp.asarray(verts)[None] + offs
        return v, v[:, :24]
    return smpl_fn, faces


def test_inference_mesh_model_and_vis():
    import jax
    import jax.numpy as jnp
    from vitpose_tpu.models.mesh import ParametricMesh
    from vitpose_tpu.models.resnet import ResNet
    from vitpose_tpu.api import inference_mesh_model, vis_3d_mesh_result

    smpl_fn, faces = _mock_smpl()
    mesh = ParametricMesh(ResNet(depth=18), smpl_fn, num_iters=2)
    variables = mesh.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))

    class Model:
        pass
    m = Model()
    m.mesh = mesh
    m.variables = variables
    m.faces = faces

    img = _rand_img()
    det = [{'bbox': [5, 5, 60, 90]}]
    res = inference_mesh_model(m, img, det, image_size=(32, 32))
    assert len(res) == 1
    r = res[0]
    assert r['vertices'].shape == (48, 3)
    assert r['keypoints_3d'].shape == (24, 3)
    assert r['camera'].shape == (3,)
    assert r['faces'] is faces

    rendered = vis_3d_mesh_result(m, res, img=img)
    assert rendered.shape == img.shape
    assert inference_mesh_model(m, img, []) == []


def test_vis_pose_tracking_result(tmp_path):
    from vitpose_tpu.api import vis_pose_tracking_result
    from vitpose_tpu.data import DatasetInfo
    info = DatasetInfo.load('coco')
    img = _rand_img()
    result = [
        dict(keypoints=np.dstack([np.random.rand(17) * 90,
                                  np.random.rand(17) * 120,
                                  np.ones(17)])[0],
             track_id=0, bbox=np.array([5, 5, 80, 110])),
        dict(keypoints=np.dstack([np.random.rand(17) * 90,
                                  np.random.rand(17) * 120,
                                  np.ones(17)])[0],
             track_id=3, bbox=np.array([10, 10, 60, 100])),
    ]
    out_file = str(tmp_path / 'track.png')
    vis = vis_pose_tracking_result(None, img, result, dataset_info=info,
                                   out_file=out_file)
    assert vis.shape == img.shape
    import os
    assert os.path.exists(out_file)


def test_init_random_seed():
    from vitpose_tpu.api import init_random_seed
    assert init_random_seed(42) == 42
    s = init_random_seed()
    assert isinstance(s, int) and 0 <= s < 2 ** 31


def test_vis_3d_pose_result_wrapper(tmp_path):
    from vitpose_tpu.api import vis_3d_pose_result
    from vitpose_tpu.data import DatasetInfo
    info = DatasetInfo.load('coco')
    result = [dict(keypoints_3d=np.random.rand(17, 3))]
    out_file = str(tmp_path / 'p3d.png')
    vis_3d_pose_result(None, result, out_file=out_file, dataset_info=info)
    import os
    assert os.path.exists(out_file)

"""DeepPose coordinate-regression family: targets, conversion parity,
flip-test inference, and the config-driven train/eval path.

References: deeppose_regression_head.py (head + fliplr_regression flip),
top_down_transform.py:761 TopDownGenerateTargetRegression,
top_down_eval.py:441 keypoints_from_regression,
configs/body/2d_kpt_sview_rgb_img/deeppose/coco/res50_coco_256x192.py.
"""
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference/tests/data/coco"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_regression_target_golden():
    """Preprocess regression targets == the reference transform math on
    the same crop-space joints."""
    from ref_loader import ref_top_down_transform
    from vitpose_tpu.data.pipeline import make_preprocess_fn
    from vitpose_tpu.ops.geometry import (affine_matrix,
                                          apply_affine_to_points)

    tdt = ref_top_down_transform()
    gen = tdt.TopDownGenerateTargetRegression()
    rng = np.random.RandomState(0)
    n, k = 3, 17
    iw, ih = 192, 256
    imgs = rng.randint(0, 255, (n, 320, 320, 3)).astype(np.uint8)
    center = np.tile([[160.0, 160.0]], (n, 1)).astype(np.float32)
    scale = np.tile([[1.2, 1.6]], (n, 1)).astype(np.float32)
    rot = np.zeros(n, np.float32)
    joints = (rng.rand(n, k, 2) * 400 - 40).astype(np.float32)
    vis = (rng.rand(n, k) > 0.2).astype(np.float32)

    pre = make_preprocess_fn(image_size=(iw, ih), use_udp=False,
                             target_type='Regression')
    out = pre(jnp.asarray(imgs), jnp.asarray(center), jnp.asarray(scale),
              jnp.asarray(rot), jnp.asarray(joints), jnp.asarray(vis))
    target = np.asarray(out['target'])
    weight = np.asarray(out['target_weight'])
    assert target.shape == (n, k, 2) and weight.shape == (n, k, 2)

    mat = np.asarray(affine_matrix(jnp.asarray(center), jnp.asarray(scale),
                                   jnp.asarray(rot), (iw, ih)))
    joints_c = np.asarray(apply_affine_to_points(jnp.asarray(joints),
                                                 jnp.asarray(mat)))
    cfg = dict(image_size=np.array([iw, ih]), joint_weights=np.ones(k),
               use_different_joint_weights=False)
    for i in range(n):
        j3 = np.concatenate([joints_c[i], np.zeros((k, 1))], axis=1)
        v3 = np.repeat(vis[i][:, None], 3, axis=1)
        t_ref, w_ref = gen._generate_target(cfg, j3, v3)
        np.testing.assert_allclose(target[i], t_ref, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(weight[i], w_ref, rtol=1e-5, atol=1e-5)


def _torch_deeppose_sd(depth=18, k=17, seed=0):
    """Random-init reference resnet + DeepPose fc head state dict."""
    import ref_cnn_loader as L
    torch.manual_seed(seed)
    net = L.ref_resnet().ResNet(depth=depth)
    net.eval()
    feat_ch = {18: 512, 50: 2048}[depth]
    fc = torch.nn.Linear(feat_ch, k * 2)
    sd = {f'backbone.{n}': v.detach().numpy()
          for n, v in net.state_dict().items()}
    sd['keypoint_head.fc.weight'] = fc.weight.detach().numpy()
    sd['keypoint_head.fc.bias'] = fc.bias.detach().numpy()
    return net, fc, sd


def test_deeppose_conversion_parity():
    """torch resnet18 + fc head -> convert_generic_topdown_checkpoint ->
    GenericTopDown(head='regression') output parity (GAP + fc on NHWC
    features == torch GAP + Linear on NCHW)."""
    from vitpose_tpu.utils.cnn_ckpt import convert_generic_topdown_checkpoint
    from vitpose_tpu.train.loop import build_model_from_cfg

    k = 17
    net, fc, sd = _torch_deeppose_sd(depth=18, k=k)
    x = np.random.RandomState(3).randn(2, 3, 64, 48).astype(np.float32)
    with torch.no_grad():
        feat = net(torch.from_numpy(x))
        feat = feat[0] if isinstance(feat, (list, tuple)) else feat
        ref = fc(feat.mean(dim=(2, 3))).reshape(2, k, 2).numpy()

    variables = convert_generic_topdown_checkpoint(sd, 'resnet')
    model = build_model_from_cfg(dict(
        backbone_type='resnet', backbone_overrides=dict(depth=18),
        img_size=(64, 48), out_channels=k, head='regression',
        target_type='Regression', use_udp=False))
    out = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      train=False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_deeppose_infer_flip_test():
    """The regression flip-test branch of `infer` == manual
    (fwd + fliplr_regression(fwd(flip(img)))) / 2 with the reference's
    static-0.5 center (deeppose_regression_head.py:110-114)."""
    from ref_loader import ref_post_transforms
    from vitpose_tpu.models.topdown import infer
    from vitpose_tpu.train.loop import build_model_from_cfg
    from vitpose_tpu.data import DatasetInfo
    from vitpose_tpu.ops import flip_index_from_pairs

    k = 17
    model = build_model_from_cfg(dict(
        backbone_type='resnet', backbone_overrides=dict(depth=18),
        img_size=(64, 48), out_channels=k, head='regression',
        target_type='Regression', flip_test=True, use_udp=False))
    x = jnp.asarray(np.random.RandomState(5).rand(2, 64, 48, 3),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    pairs = DatasetInfo.load('coco').flip_pairs
    fi = flip_index_from_pairs(pairs, k)
    got = np.asarray(infer(model, variables, x, flip_index=fi))

    fwd = np.asarray(model.apply(variables, x, train=False))
    fwd_f = np.asarray(model.apply(variables, x[:, :, ::-1, :],
                                   train=False))
    pt = ref_post_transforms()
    flipped_back = pt.fliplr_regression(fwd_f, pairs)     # static x=0.5
    np.testing.assert_allclose(got, (fwd + flipped_back) / 2,
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_deeppose_train_and_eval(tmp_path):
    """Config-driven DeepPose training + regression decode evaluation on
    the COCO fixture (the tools/train.py + tools/test.py path)."""
    import json
    from vitpose_tpu.utils.config import load_config
    from vitpose_tpu.train.loop import train_model

    work_dir = str(tmp_path / 'wd')
    cfg_file = tmp_path / 'deeppose_smoke.py'
    cfg_file.write_text(f"""
_base_ = ['{REPO}/vitpose_tpu/configs/base/default_runtime.py']
model = dict(backbone_type='resnet', backbone_overrides=dict(depth=18),
             img_size=(64, 48), out_channels=17, head='regression',
             target_type='Regression', reg_loss='smooth_l1',
             flip_test=True, use_udp=False)
data = dict(dataset='coco', image_size=(48, 64), heatmap_size=(12, 16),
            batch_size=4, canvas_size=640, num_workers=2,
            train=dict(ann_file='{REF}/test_coco.json', img_prefix='{REF}/'),
            val=dict(ann_file='{REF}/test_coco.json', img_prefix='{REF}/',
                     use_gt_bbox=True))
target = dict(encoding='MSRA', sigma=1.5)
optimizer = dict(base_lr=1e-3, warmup_iters=2, decay_epochs=(100, 200),
                 total_epochs=1)
runtime = dict(work_dir='{work_dir}', log_interval=1, eval_interval=1,
               ckpt_interval=0, seed=0)
""")
    cfg = load_config(str(cfg_file))
    state = train_model(cfg, work_dir=work_dir)
    assert state is not None
    records = [json.loads(l) for l in open(
        os.path.join(work_dir, 'train.log.json'))]
    train_recs = [r for r in records if r.get('mode') == 'train']
    assert train_recs and all(np.isfinite(r['reg_loss'])
                              for r in train_recs)
    assert all(0.0 <= r['acc_pose'] <= 1.0 for r in train_recs)
    ep = [r for r in records if r.get('mode') == 'epoch']
    assert ep and 'AP' in ep[-1] and np.isfinite(ep[-1]['AP'])


def test_init_pose_model_from_config_file(tmp_path):
    """Reference API contract: init_pose_model(config_file) works for
    generic-backbone (CNN) and regression configs, and
    inference_top_down_pose_model decodes through the regression path
    (reference apis/inference.py:21 takes config paths)."""
    from vitpose_tpu.api import (init_pose_model,
                                 inference_top_down_pose_model)

    cfg_file = tmp_path / 'deeppose_api.py'
    cfg_file.write_text(f"""
_base_ = ['{REPO}/vitpose_tpu/configs/base/default_runtime.py']
model = dict(backbone_type='resnet', backbone_overrides=dict(depth=18),
             img_size=(64, 48), out_channels=17, head='regression',
             target_type='Regression', flip_test=True, use_udp=False)
data = dict(dataset='coco', image_size=(48, 64), heatmap_size=(12, 16),
            batch_size=4,
            train=dict(ann_file='{REF}/test_coco.json', img_prefix='{REF}/'))
""")
    model = init_pose_model(str(cfg_file))
    person_results = [{'bbox': [280.8, 44.7, 218.7, 346.7, 0.99]}]
    pose_results, _ = inference_top_down_pose_model(
        model, f"{REF}/000000000785.jpg", person_results)
    kp = pose_results[0]['keypoints']
    assert kp.shape == (17, 3) and np.isfinite(kp).all()
    # regression outputs are sigmoid-free fc values ~0 at init: decoded
    # points land near the box, confidence column is the 1.0 placeholder
    assert (kp[:, 2] == 1.0).all()


def test_init_pose_model_npz_roundtrip(tmp_path):
    """init_pose_model(config_file, checkpoint.npz) loads save_params_npz
    exports (the tools/train.py -> API serving handoff)."""
    from vitpose_tpu.api.inference import (init_pose_model,
                                           load_checkpoint_variables)
    from vitpose_tpu.utils.checkpoint import save_params_npz

    cfg_file = tmp_path / 'hrnet_api.py'
    cfg_file.write_text(f"""
_base_ = ['{REPO}/vitpose_tpu/configs/base/default_runtime.py']
model = dict(backbone_type='hrnet',
             backbone_overrides=dict(width=16, stage_modules=(1, 1, 1)),
             img_size=(64, 64), out_channels=17, head='heatmap',
             deconv_filters=(), flip_test=False, use_udp=False)
data = dict(dataset='coco', image_size=(64, 64), heatmap_size=(16, 16))
""")
    m = init_pose_model(str(cfg_file))
    p = tmp_path / 'w.npz'
    save_params_npz(str(p), m.variables)
    m2 = init_pose_model(str(cfg_file), checkpoint=str(p))
    a = jax.tree.leaves(m.variables)[0]
    b = jax.tree.leaves(m2.variables)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))

"""Round-2 tail components: fliplr_regression golden, AEMultiStageHead
parity, freeze masks, dataset wrappers, analysis tools."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_fliplr_regression_golden():
    from ref_loader import ref_post_transforms
    from vitpose_tpu.ops.geometry import fliplr_regression
    pt = ref_post_transforms()
    rng = np.random.RandomState(0)
    reg = rng.randn(4, 17, 3).astype(np.float32)
    pairs = [[1, 2], [3, 4], [5, 6]]
    for kw in (dict(center_mode='static', center_x=0.5),
               dict(center_mode='root', center_index=0)):
        ref = pt.fliplr_regression(reg.copy(), pairs, **kw)
        ours = np.asarray(fliplr_regression(reg, pairs, **kw))
        np.testing.assert_allclose(ours, ref, rtol=1e-6)
    # sequence input [N, T, K, C]
    seq = rng.randn(2, 5, 17, 2).astype(np.float32)
    ref = pt.fliplr_regression(seq.copy(), pairs, center_mode='static')
    ours = np.asarray(fliplr_regression(seq, pairs, center_mode='static'))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_ae_multi_stage_head_parity():
    import ref_cnn_loader as L
    from vitpose_tpu.models.heads_extra import AEMultiStageHead
    from vitpose_tpu.utils.cnn_ckpt import Cv
    L._install_stubs()
    mod = L._load_as('mmpose.models.heads.ae_multi_stage_head',
                     'mmpose/models/heads/ae_multi_stage_head.py')
    torch.manual_seed(0)
    net = mod.AEMultiStageHead(in_channels=32, out_channels=34,
                               num_stages=2, num_deconv_layers=1,
                               num_deconv_filters=(32,),
                               num_deconv_kernels=(4,),
                               extra=dict(final_conv_kernel=1))
    net.eval()
    x = [np.random.RandomState(i).randn(2, 32, 8, 6).astype(np.float32)
         for i in range(2)]
    with torch.no_grad():
        refs = [t.numpy() for t in net([torch.from_numpy(v) for v in x])]

    cv = Cv({k: v.numpy() for k, v in net.state_dict().items()})
    for si in range(2):
        cv._put(cv.params, (f's{si}_deconv_0', 'kernel'),
                cv.get(f'multi_deconv_layers.{si}.0.weight')
                .transpose(2, 3, 1, 0))
        cv.bn(f'multi_deconv_layers.{si}.1', f's{si}_bn_0')
        cv.conv(f'multi_final_layers.{si}', f's{si}_final')
    params, stats = cv.out()
    model = AEMultiStageHead(out_channels=34, num_stages=2,
                             num_deconv_layers=1, deconv_filters=(32,),
                             deconv_kernels=(4,))
    outs = model.apply({'params': params, 'batch_stats': stats},
                       [jnp.asarray(v.transpose(0, 2, 3, 1)) for v in x],
                       train=False)
    for o, r in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(o), r, rtol=1e-4, atol=1e-4)


def test_freeze_mask():
    from vitpose_tpu.models.vit import ViT, ViTConfig
    from vitpose_tpu.train.optim import make_freeze_mask
    cfg = ViTConfig(img_size=(64, 48), embed_dim=32, depth=4, num_heads=4)
    params = ViT(cfg).init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 48, 3)))['params']
    m = make_freeze_mask(params, frozen_stages=2)
    assert not any(jax.tree_util.tree_leaves(m['patch_embed']))
    assert not any(jax.tree_util.tree_leaves(m['blocks_1']))
    assert not any(jax.tree_util.tree_leaves(m['blocks_2']))
    # reference quirk: block 0 stays trainable under frozen_stages
    assert all(jax.tree_util.tree_leaves(m['blocks_0']))
    assert all(jax.tree_util.tree_leaves(m['blocks_3']))

    m = make_freeze_mask(params, freeze_attn=True)
    assert not any(jax.tree_util.tree_leaves(m['blocks_0']['attn']))
    assert not any(jax.tree_util.tree_leaves(m['blocks_0']['norm1']))
    assert all(jax.tree_util.tree_leaves(m['blocks_0']['mlp']))

    m = make_freeze_mask(params, freeze_ffn=True)
    assert not any(jax.tree_util.tree_leaves(m['blocks_3']['mlp']))
    assert not m['pos_embed']
    assert all(jax.tree_util.tree_leaves(m['blocks_3']['attn']))

    # usable through freeze_tx
    import optax
    from vitpose_tpu.train.optim import freeze_tx
    tx = freeze_tx(optax.sgd(1.0),
                   make_freeze_mask(params, frozen_stages=2))
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    upd, _ = tx.update(grads, state, params)
    assert float(jnp.abs(upd['blocks_1']['mlp']['fc1']['kernel']).max()) == 0
    assert float(jnp.abs(upd['blocks_3']['mlp']['fc1']['kernel']).max()) > 0


def test_dataset_wrappers():
    from vitpose_tpu.data import TopDownDataset
    from vitpose_tpu.data.loader import (RepeatDataset, ConcatPoseDataset,
                                         TopDownLoader)
    REF = '/root/reference/tests/data/coco'
    ds = TopDownDataset(f'{REF}/test_coco.json', f'{REF}/',
                        dataset_info='coco', test_mode=True,
                        use_gt_bbox=True, image_size=(48, 64),
                        heatmap_size=(12, 16))
    rep = RepeatDataset(ds, 3)
    assert len(rep) == 3 * len(ds)
    assert rep.num_joints == 17
    cat = ConcatPoseDataset([ds, ds])
    assert len(cat) == 2 * len(ds)
    loader = TopDownLoader(rep, batch_size=4, is_train=False)
    n = sum(b['valid'].sum() for b in loader)
    assert n == len(rep)


def test_translation_augmentation():
    from vitpose_tpu.data.pipeline import (AugmentConfig,
                                           sample_augmentations)
    from vitpose_tpu.data import DatasetInfo
    rng = np.random.RandomState(0)
    rec = dict(center=np.array([100.0, 100.0], np.float32),
               scale=np.array([1.0, 1.0], np.float32),
               joints_3d=np.zeros((17, 3), np.float32),
               joints_3d_visible=np.ones((17, 3), np.float32))
    aug = AugmentConfig(flip_prob=0.0, half_body_prob=0.0, scale_factor=0.0,
                        rot_prob=0.0, trans_prob=1.0, trans_factor=0.15)
    info = DatasetInfo.load('coco')
    c, s, rot, j, v, _ = sample_augmentations(rng, rec, info, 640, aug,
                                              (192, 256))
    assert not np.allclose(c, rec['center'])
    assert np.all(np.abs(c - rec['center']) <= 0.15 * 200 + 1e-5)


@pytest.mark.slow
def test_analysis_tools_run(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS='cpu', PYTHONPATH=REPO)
    # print_config
    r = subprocess.run(
        [sys.executable, 'tools/analysis/print_config.py',
         'vitpose_tpu/configs/coco/vitpose_s_coco_256x192.py'],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0 and "'variant'" in r.stdout, r.stderr
    # plot_log_json
    log = tmp_path / 'log.jsonl'
    log.write_text('\n'.join(json.dumps(dict(step=i, loss=1.0 / (i + 1)))
                             for i in range(5)))
    out = tmp_path / 'c.png'
    r = subprocess.run(
        [sys.executable, 'tools/analysis/plot_log_json.py', str(log),
         '--out', str(out)], cwd=REPO, env=env, capture_output=True,
        text=True, timeout=300)
    assert r.returncode == 0 and out.exists(), r.stderr
    # eval_detector: GT as detections -> AP 1.0
    gt_path = '/root/reference/tests/data/coco/test_coco.json'
    dets = []
    gtd = json.load(open(gt_path))
    for a in gtd['annotations']:
        if max(a['keypoints']) == 0:
            continue
        kp = np.asarray(a['keypoints'], np.float64).reshape(-1, 3)
        kp[:, 2] = 0.9
        dets.append(dict(image_id=a['image_id'], category_id=1,
                         keypoints=kp.flatten().tolist(), score=1.0))
    det_path = tmp_path / 'dets.json'
    det_path.write_text(json.dumps(dets))
    r = subprocess.run(
        [sys.executable, 'tools/eval_detector.py', gt_path, str(det_path)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    stats = json.loads(r.stdout)
    assert stats['AP'] > 0.99, stats


def test_hybrid_embed():
    from vitpose_tpu.models.vit import HybridEmbed, Block
    from vitpose_tpu.models.resnet import ResNet
    he = HybridEmbed(backbone=ResNet(depth=18), embed_dim=64)
    x = jnp.zeros((1, 64, 64, 3))
    v = he.init(jax.random.PRNGKey(0), x)
    tok = he.apply(v, x)
    assert tok.shape == (1, 4, 64)       # 64/32=2 -> 2x2 tokens
    blk = Block(num_heads=4)
    bv = blk.init(jax.random.PRNGKey(1), tok)
    assert blk.apply(bv, tok).shape == tok.shape


def test_vis_pose_result_3d_full_options(tmp_path):
    """3D pose rendering with the reference imshow_keypoints_3d options:
    image side panel, per-kpt/link palettes, score threshold hiding
    low-confidence joints (reference core/visualization/image.py:205)."""
    import numpy as np
    from vitpose_tpu.api.inference import vis_pose_result_3d
    from vitpose_tpu.data import DatasetInfo

    info = DatasetInfo.load('h36m')
    rng = np.random.RandomState(0)
    kp = rng.rand(17, 4).astype(np.float32)
    kp[:, 3] = 0.9
    kp_low = kp.copy()
    kp_low[5:, 3] = 0.1                       # hidden below threshold
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    out = str(tmp_path / 'vis3d.png')
    fig = vis_pose_result_3d(
        [dict(keypoints_3d=kp, title='p0'), dict(keypoints_3d=kp_low)],
        skeleton=info.skeleton_links, img=img,
        pose_kpt_color=info.keypoint_colors,
        pose_link_color=info.skeleton_colors,
        kpt_score_thr=0.3, out_file=out)
    import os
    assert os.path.getsize(out) > 1000
    # image panel + 2 pose panels
    assert len(fig.axes) == 3


def test_best_checkpoint_min_mode(tmp_path):
    """save_best='NME' must track the LOWEST value (reference
    eval_hooks.py greater/less metric key lists); 'AP' the highest."""
    import json
    import jax.numpy as jnp
    from vitpose_tpu.utils.checkpoint import CheckpointManager

    class _S:
        params = {'w': jnp.zeros(2)}
        batch_stats = {}
        opt_state = {}
        step = jnp.zeros((), jnp.int32)

    ck = CheckpointManager(str(tmp_path / 'nme'), save_best_metric='NME')
    assert ck.mode == 'min'
    ck.save(0, _S(), metrics={'NME': 0.5})
    ck.save(1, _S(), metrics={'NME': 0.3})
    ck.save(2, _S(), metrics={'NME': 0.4})
    meta = json.load(open(str(tmp_path / 'nme' / 'meta.json')))
    assert meta['best_epoch'] == 1 and meta['best_value'] == 0.3

    ck2 = CheckpointManager(str(tmp_path / 'ap'), save_best_metric='AP')
    assert ck2.mode == 'max'
    ck2.save(0, _S(), metrics={'AP': 0.5})
    ck2.save(1, _S(), metrics={'AP': 0.7})
    meta2 = json.load(open(str(tmp_path / 'ap' / 'meta.json')))
    assert meta2['best_epoch'] == 1 and meta2['best_value'] == 0.7


def test_best_weights_survive_retention_gc(tmp_path):
    """The best epoch's WEIGHTS must remain restorable after orbax's
    max_to_keep garbage-collects its step dir (review finding: meta.json
    pointed at a deleted checkpoint); switching the tracked metric in an
    existing work_dir must reset best tracking."""
    import jax.numpy as jnp
    from vitpose_tpu.utils.checkpoint import CheckpointManager

    def state(v):
        class _S:
            params = {'w': jnp.full((2,), float(v))}
            batch_stats = {}
            opt_state = {}
            step = jnp.zeros((), jnp.int32)
        return _S()

    d = str(tmp_path / 'run')
    ck = CheckpointManager(d, max_to_keep=2, save_best_metric='AP')
    ck.save(0, state(0.0), metrics={'AP': 0.9})      # the best
    for e in range(1, 4):                            # worse, GCs epoch 0
        ck.save(e, state(e), metrics={'AP': 0.1 * e})
    assert ck.latest_epoch() == 3
    best = ck.restore_best()
    assert best is not None
    np.testing.assert_allclose(best['params']['w'], [0.0, 0.0])

    # metric switch resets best tracking instead of comparing AP vs NME
    ck2 = CheckpointManager(d, save_best_metric='NME')
    assert ck2.best_value == np.inf


def test_pth_reader_rejects_out_of_bounds_view(tmp_path):
    """A crafted size/stride view larger than its storage must be refused
    (the safe loader otherwise reads out-of-bounds process memory)."""
    import pytest
    from vitpose_tpu.utils import pth_reader as PR

    class _PH:
        storage_type = 'FloatStorage'
        key = 'k0'
        numel = 4

    raw = np.arange(4, dtype=np.float32).tobytes()
    obj = ('tensor', _PH(), 0, (2 ** 20,), (1,))
    with pytest.raises(ValueError, match='exceeds storage'):
        PR._materialize(obj, lambda k: raw)
    with pytest.raises(ValueError, match='exceeds storage'):
        PR._materialize(('tensor', _PH(), 2, (2, 2), (2, 1)),
                        lambda k: raw)
    ok = PR._materialize(('tensor', _PH(), 0, (2, 2), (2, 1)),
                         lambda k: raw)
    np.testing.assert_allclose(ok, [[0, 1], [2, 3]])


def test_pos_embed_clsless_and_distilled_sources():
    """_interpolate_pos_embed must adapt cls-less and 2-prefix-token
    sources to the flax [1, num_patches+1, C] shape (review finding: they
    previously crashed or silently mismatched)."""
    from vitpose_tpu.utils.torch_ckpt import _interpolate_pos_embed

    c = 8
    # cls-less source already at the target grid
    out = _interpolate_pos_embed(np.ones((1, 192, c), np.float32), 192,
                                 (16, 12))
    assert out.shape == (1, 193, c) and np.allclose(out[:, 0], 0)
    # cls-less 14x14 source -> 16x12 grid
    out = _interpolate_pos_embed(
        np.random.RandomState(0).randn(1, 196, c).astype(np.float32),
        192, (16, 12))
    assert out.shape == (1, 193, c) and np.allclose(out[:, 0], 0)
    # distilled source: 2 prefix tokens + 14x14
    out = _interpolate_pos_embed(
        np.random.RandomState(1).randn(1, 198, c).astype(np.float32),
        192, (16, 12))
    assert out.shape == (1, 193, c)
    # classic cls + 14x14 still exact
    out = _interpolate_pos_embed(
        np.random.RandomState(2).randn(1, 197, c).astype(np.float32),
        192, (16, 12))
    assert out.shape == (1, 193, c)

"""CLI-level integration: config loading, train loop smoke with eval +
checkpointing + resume, on the reference COCO fixture."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REF = "/root/reference/tests/data/coco"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def write_smoke_config(tmp_path, work_dir):
    cfg = tmp_path / "smoke.py"
    cfg.write_text(f"""
_base_ = ['{REPO}/vitpose_tpu/configs/base/default_runtime.py']
model = dict(variant='s', img_size=(64, 48), out_channels=17,
             head='heatmap', flip_test=True, use_udp=True,
             post_process='default')
data = dict(
    dataset='coco',
    image_size=(48, 64), heatmap_size=(12, 16),
    batch_size=4, canvas_size=640, num_workers=2,
    train=dict(ann_file='{REF}/test_coco.json', img_prefix='{REF}/'),
    val=dict(ann_file='{REF}/test_coco.json', img_prefix='{REF}/',
             use_gt_bbox=True),
)
target = dict(encoding='UDP', sigma=1.5)
optimizer = dict(base_lr=1e-3, warmup_iters=2, decay_epochs=(100, 200),
                 total_epochs=2)
runtime = dict(work_dir='{work_dir}', log_interval=1, eval_interval=1,
               ckpt_interval=1, seed=0)
""")
    return str(cfg)


def test_config_system(tmp_path):
    from vitpose_tpu.utils.config import load_config, apply_options
    cfg = load_config(
        f"{REPO}/vitpose_tpu/configs/coco/vitpose_b_coco_256x192.py")
    assert cfg['model']['variant'] == 'b'
    assert cfg['optimizer']['base_lr'] == 5e-4
    assert cfg['runtime']['log_interval'] == 50     # from base
    simple = load_config(
        f"{REPO}/vitpose_tpu/configs/coco/vitpose_b_simple_coco_256x192.py")
    assert simple['model']['head'] == 'simple'
    assert simple['model']['variant'] == 'b'        # inherited
    assert simple['optimizer']['base_lr'] == 2e-4   # overridden
    over = apply_options(cfg, ['optimizer.base_lr=1e-5',
                               'model.variant=h'])
    assert over['optimizer']['base_lr'] == 1e-5
    assert over['model']['variant'] == 'h'


@pytest.mark.slow
def test_train_loop_with_eval_and_resume(tmp_path):
    # Use the in-process API (subprocess would re-init jax on TPU).
    from vitpose_tpu.utils.config import load_config
    from vitpose_tpu.train.loop import train_model

    work_dir = str(tmp_path / "wd")
    # shrink the model for speed
    cfg = load_config(write_smoke_config(tmp_path, work_dir))
    cfg['model'] = dict(variant='s', img_size=(64, 48), out_channels=17,
                        head='heatmap', flip_test=True, use_udp=True,
                        backbone_overrides=dict(embed_dim=32, depth=2,
                                                num_heads=4))
    state = train_model(cfg, work_dir=work_dir)
    assert state is not None

    log_path = os.path.join(work_dir, 'train.log.json')
    records = [json.loads(l) for l in open(log_path)]
    assert any(r.get('mode') == 'train' for r in records)
    epoch_recs = [r for r in records if r.get('mode') == 'epoch']
    assert len(epoch_recs) == 2
    assert 'AP' in epoch_recs[-1]          # eval ran

    ckpt_dir = os.path.join(work_dir, 'ckpts')
    assert os.path.isdir(ckpt_dir)

    # resume continues from latest epoch without error
    cfg['optimizer']['total_epochs'] = 3
    state2 = train_model(cfg, work_dir=work_dir, resume=True)
    records = [json.loads(l) for l in open(log_path)]
    assert any(r.get('mode') == 'resume' for r in records)


@pytest.mark.slow
def test_train_loop_frozen_stages(tmp_path):
    """optimizer.frozen_stages freezes patch_embed + blocks 1..N through
    the config path (reference vit.py:249 _freeze_stages)."""
    import jax
    import numpy as np
    from vitpose_tpu.utils.config import load_config
    from vitpose_tpu.train.loop import train_model

    work_dir = str(tmp_path / "wd")
    cfg = load_config(write_smoke_config(tmp_path, work_dir))
    cfg['model'] = dict(variant='s', img_size=(64, 48), out_channels=17,
                        head='heatmap', flip_test=True, use_udp=True,
                        backbone_overrides=dict(embed_dim=32, depth=2,
                                                num_heads=4))
    cfg['optimizer']['frozen_stages'] = 1
    cfg['optimizer']['total_epochs'] = 1
    cfg['runtime']['eval_interval'] = 10      # skip eval for speed
    state = train_model(cfg, work_dir=work_dir, max_steps=3)
    p = state.params['backbone']

    cfg2 = dict(cfg)
    cfg2['optimizer'] = dict(cfg['optimizer'])
    del cfg2['optimizer']['frozen_stages']
    state2 = train_model(cfg2, work_dir=str(tmp_path / "wd2"), max_steps=3)
    p2 = state2.params['backbone']

    # Same seed + data: were frozen_stages a no-op the two runs would be
    # bit-identical. The frozen leaves (patch_embed, blocks_1) must differ
    # because only the unfrozen run trained them; the trainable blocks_0
    # (reference quirk: freezing starts at block 1) must match because
    # identical updates flowed through both runs' first steps only if the
    # frozen leaves actually stayed put — so just assert divergence where
    # training was suppressed.
    for name in ('patch_embed', 'blocks_1'):
        a = np.asarray(jax.tree.leaves(p[name])[0])
        b = np.asarray(jax.tree.leaves(p2[name])[0])
        assert not np.allclose(a, b), f'{name} should be frozen vs trained'


@pytest.mark.slow
def test_train_loop_cnn_backbone(tmp_path):
    """The generic (CNN-backbone) estimator trains through the same loop:
    build from config, 2 steps, finite decreasing loss."""
    from vitpose_tpu.utils.config import load_config
    from vitpose_tpu.train.loop import train_model
    cfg_file = tmp_path / 'hrnet_smoke.py'
    cfg_file.write_text(f"""
_base_ = ['{REPO}/vitpose_tpu/configs/base/default_runtime.py']
model = dict(backbone_type='hrnet',
             backbone_overrides=dict(width=16, stage_modules=(1, 1, 1)),
             img_size=(64, 64), out_channels=17, head='heatmap',
             deconv_filters=(), flip_test=True, use_udp=True,
             post_process='default')
data = dict(dataset='coco', image_size=(64, 64), heatmap_size=(16, 16),
            batch_size=4, canvas_size=640, num_workers=2,
            train=dict(ann_file='{REF}/test_coco.json', img_prefix='{REF}/'),
            val=dict(ann_file='{REF}/test_coco.json', img_prefix='{REF}/',
                     use_gt_bbox=True))
target = dict(encoding='UDP', sigma=1.5)
optimizer = dict(base_lr=1e-3, warmup_iters=2, decay_epochs=(100, 200),
                 total_epochs=1)
runtime = dict(work_dir='{tmp_path}/wd', log_interval=1, eval_interval=0,
               ckpt_interval=0, seed=0)
""")
    cfg = load_config(str(cfg_file))
    state = train_model(cfg, max_steps=2)
    assert state is not None


@pytest.mark.slow
def test_top_down_img_demo_cli(tmp_path):
    """The flagship demo script end-to-end via its CLI (random weights;
    behavioral, like the reference tests/test_apis)."""
    import subprocess
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    img = '/root/reference/tests/data/coco/000000000785.jpg'
    ann = '/root/reference/tests/data/coco/test_coco.json'
    if not os.path.exists(img):
        pytest.skip('fixture missing')
    out = subprocess.run(
        [sys.executable, 'demo/top_down_img_demo.py', img,
         '--json-file', ann, '--variant', 's',
         '--out-img-root', str(tmp_path)],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    assert any(f.suffix == '.jpg' for f in tmp_path.iterdir())


@pytest.mark.slow
def test_train_loop_combined_target(tmp_path):
    """CombinedTarget (UDP offset) training end-to-end through the config
    path: preprocess emits 3K-channel targets, head emits 3K channels, the
    CombinedTargetMSE loss wires up (reference top_down_transform.py:625
    target + mse_loss.py:48 loss)."""
    from vitpose_tpu.utils.config import load_config
    from vitpose_tpu.train.loop import train_model
    work_dir = str(tmp_path / "wd")
    cfg = load_config(write_smoke_config(tmp_path, work_dir))
    cfg['model'] = dict(variant='s', img_size=(64, 48), out_channels=51,
                        head='heatmap', flip_test=True, use_udp=True,
                        target_type='CombinedTarget',
                        backbone_overrides=dict(embed_dim=32, depth=2,
                                                num_heads=4))
    cfg['optimizer']['total_epochs'] = 1
    cfg['runtime']['eval_interval'] = 1
    state = train_model(cfg, work_dir=work_dir, max_steps=2)
    assert state is not None
    records = [json.loads(l) for l in open(
        os.path.join(work_dir, 'train.log.json'))]
    losses = [r['heatmap_loss'] for r in records if r.get('mode') == 'train']
    assert losses and all(np.isfinite(l) for l in losses)


@pytest.mark.slow
def test_resume_redoes_incomplete_epoch(tmp_path):
    """A preemption checkpoint (meta completed=False) makes resume redo
    that epoch instead of skipping its remaining iterations."""
    from vitpose_tpu.utils.config import load_config
    from vitpose_tpu.train.loop import train_model
    work_dir = str(tmp_path / "wd")
    cfg = load_config(write_smoke_config(tmp_path, work_dir))
    cfg['model'] = dict(variant='s', img_size=(64, 48), out_channels=17,
                        head='heatmap', flip_test=False, use_udp=True,
                        backbone_overrides=dict(embed_dim=32, depth=2,
                                                num_heads=4))
    cfg['runtime']['eval_interval'] = 10    # skip eval for speed
    train_model(cfg, work_dir=work_dir)     # 2 epochs -> ckpt at epoch 1
    info_path = os.path.join(work_dir, 'ckpts', 'info_1.json')
    info = json.load(open(info_path))
    assert info.get('meta', {}).get('completed') is not False
    # mark epoch 1's checkpoint as a mid-epoch preemption save
    info['meta'] = {'completed': False}
    json.dump(info, open(info_path, 'w'))
    cfg['optimizer']['total_epochs'] = 3
    train_model(cfg, work_dir=work_dir, resume=True, max_steps=1)
    records = [json.loads(l) for l in open(
        os.path.join(work_dir, 'train.log.json'))]
    resume_recs = [r for r in records if r.get('mode') == 'resume']
    assert resume_recs and resume_recs[-1]['epoch'] == 1   # redo, not 2


def test_prune_work_dirs(tmp_path):
    """reference prune_work_dirs.py selection semantics on orbax-style
    numbered step dirs: last step always kept, best/ never touched."""
    import sys
    sys.path.insert(0, os.path.join(REPO, 'tools'))
    try:
        from prune_work_dirs import prune_run_dir, select_checkpoints
    finally:
        sys.path.pop(0)
    run = tmp_path / 'run_a'
    run.mkdir()
    for s in (10, 20, 30, 40, 50):
        (run / str(s)).mkdir()
    (run / 'best').mkdir()
    kept, removed = prune_run_dir(str(run), 2, 'last', dry=False)
    assert kept == [40, 50] and removed == [10, 20, 30]
    assert (run / 'best').exists()
    assert sorted(int(p.name) for p in run.iterdir()
                  if p.name.isdigit()) == [40, 50]
    assert select_checkpoints([1, 2, 3, 4], 10) == {1, 2, 3, 4}
    assert 4 in select_checkpoints([1, 2, 3, 4], 2, 'uniform')


def test_sync_annotation_ids(tmp_path):
    import sys
    sys.path.insert(0, os.path.join(REPO, 'tools'))
    try:
        from sync_annotation_ids import sync_annotation_ids
    finally:
        sys.path.pop(0)
    src = {'info': {}, 'licenses': [], 'categories': [{'id': 1}],
           'images': [{'id': 100, 'file_name': 'a.jpg'},
                      {'id': 101, 'file_name': 'b.jpg'}]}
    tgt = {'images': [{'id': 1, 'file_name': 'a.jpg'},
                      {'id': 2, 'file_name': 'b.jpg'}],
           'annotations': [{'image_id': 1, 'keypoints': []},
                           {'image_id': 2, 'id': 7}]}
    out = sync_annotation_ids(src, tgt)
    assert [a['image_id'] for a in out['annotations']] == [100, 101]
    assert all('id' in a and 'bbox' in a for a in out['annotations'])
    assert out['images'] == src['images']
    # bare list target -> wrapped into a full COCO dict
    out2 = sync_annotation_ids(src, [{'image_id': 5}])
    assert out2['categories'] == src['categories']


def test_bottomup_eval_cli(tmp_path):
    """tools/test.py dispatches family='bottomup' configs: random-init
    HRNet-AE over the coco fixture -> grouped people -> mAP stats json."""
    import json
    import numpy as np
    import jax
    from vitpose_tpu.utils.config import load_config, apply_options
    from vitpose_tpu.train.loop import build_model_from_cfg
    from vitpose_tpu.utils.checkpoint import save_params_npz

    ref = '/root/reference/tests/data/coco'
    cfg_path = os.path.join(REPO, 'vitpose_tpu', 'configs', 'coco',
                            'hrnet_w32_ae_coco_512x512.py')
    opts = [f"data.val.ann_file={ref}/test_coco.json",
            f"data.val.img_prefix={ref}/",
            'data.base_size=128',
            'model.backbone_overrides.width=8']
    cfg = apply_options(load_config(cfg_path), opts)
    model = build_model_from_cfg(cfg['model'])
    import jax.numpy as jnp
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    ckpt = tmp_path / 'bu.npz'
    save_params_npz(str(ckpt), variables)

    import sys
    sys_argv = ['tools/test.py', cfg_path, str(ckpt),
                '--cfg-options'] + opts + [
                '--out', str(tmp_path / 'stats.json')]
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        '_test_cli_bu', os.path.join(REPO, 'tools', 'test.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old_argv = sys.argv
    try:
        sys.argv = sys_argv
        mod.main()
    finally:
        sys.argv = old_argv
    stats = json.loads((tmp_path / 'stats.json').read_text())
    assert 'AP' in stats and np.isfinite(stats['AP'])


def test_config_delete_marker(tmp_path):
    """mmcv _delete_ semantics: replaces the base dict wholesale and never
    leaks into the merged config — including when the base lacks the key."""
    from vitpose_tpu.utils.config import load_config
    base = tmp_path / 'base.py'
    base.write_text("model = dict(a=1, b=2)\n")
    child = tmp_path / 'child.py'
    child.write_text(
        f"_base_ = ['{base}']\n"
        "model = dict(_delete_=True, c=3)\n"
        "extra = dict(_delete_=True, d=4)\n")   # key absent from base
    cfg = load_config(str(child))
    assert cfg['model'] == {'c': 3}
    assert cfg['extra'] == {'d': 4}
    assert '_delete_' not in cfg['model'] and '_delete_' not in cfg['extra']


def test_family_loop_resume_loads_weights(tmp_path):
    """--resume in the family loops reloads work_dir/final.npz (it was
    previously accepted and ignored)."""
    import jax
    from vitpose_tpu.train.loop import train_model

    h36m = "/root/reference/tests/data/h36m/test_h36m_body3d.npz"
    wd = str(tmp_path / 'wd')
    cfg = dict(
        model=dict(family='pose_lifter', num_joints=17, stem_channels=32,
                   kernel_sizes=(3, 3)),
        data=dict(dataset='h36m', seq_len=9, batch_size=2,
                  train=dict(ann_file=h36m)),
        optimizer=dict(base_lr=1e-3, lr_decay=0.975, total_epochs=1),
        runtime=dict(work_dir=wd))
    v1, _ = train_model(cfg, work_dir=wd, max_steps=2)
    v2, _ = train_model(cfg, work_dir=wd, max_steps=1, resume=True)
    v3, _ = train_model(cfg, work_dir=wd, max_steps=1, resume=False)
    leaf = lambda v: np.asarray(jax.tree.leaves(v)[0])
    # resumed run starts FROM v1 (one extra step moves it a little);
    # fresh run starts from init -> far from v1
    d_resume = np.abs(leaf(v2) - leaf(v1)).max()
    d_fresh = np.abs(leaf(v3) - leaf(v1)).max()
    assert d_resume < d_fresh, (d_resume, d_fresh)


@pytest.mark.slow
def test_train_cli_subprocess(tmp_path):
    """tools/train.py as a real CLI process: config + --cfg-options +
    --max-steps + --work-dir plumbing end-to-end (the in-process tests
    bypass argparse/bootstrap)."""
    work_dir = str(tmp_path / 'wd')
    cfg_file = tmp_path / 'cli_smoke.py'
    cfg_file.write_text(f"""
_base_ = ['{tmp_path}/smoke.py']
model = dict(variant='s', img_size=(64, 48), out_channels=17,
             head='heatmap', flip_test=True, use_udp=True,
             backbone_overrides=dict(embed_dim=32, depth=2, num_heads=4))
""")
    write_smoke_config(tmp_path, work_dir)
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    out = subprocess.run(
        [sys.executable, 'tools/train.py', str(cfg_file),
         '--work-dir', work_dir, '--max-steps', '2', '--seed', '1',
         '--cfg-options', 'runtime.eval_interval=0'],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    records = [json.loads(l) for l in open(
        os.path.join(work_dir, 'train.log.json'))]
    train_recs = [r for r in records if r.get('mode') == 'train']
    assert train_recs and np.isfinite(train_recs[-1]['heatmap_loss'])


@pytest.mark.slow
def test_train_loop_load_from(tmp_path):
    """cfg `load_from` initializes the FULL model (backbone + head) from a
    checkpoint before finetuning (reference mmcv runner load_checkpoint;
    the fork's ViTPose_*_combo_finetune_* configs depend on it)."""
    import jax
    import jax.numpy as jnp
    from vitpose_tpu.utils.config import load_config
    from vitpose_tpu.train.loop import train_model, build_model_from_cfg
    from vitpose_tpu.utils.checkpoint import save_params_npz

    work_dir = str(tmp_path / "wd")
    cfg = load_config(write_smoke_config(tmp_path, work_dir))
    mcfg = dict(variant='s', img_size=(64, 48), out_channels=17,
                head='heatmap', flip_test=True, use_udp=True,
                backbone_overrides=dict(embed_dim=32, depth=2,
                                        num_heads=4))
    cfg['model'] = mcfg

    # craft a donor checkpoint with a recognizable head-bias value
    model = build_model_from_cfg(mcfg)
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 64, 48, 3)), train=False)
    params = jax.tree.map(lambda a: a, variables['params'])
    fl = params['head']['final']
    fl['bias'] = jnp.full_like(fl['bias'], 7.0)
    donor = str(tmp_path / "donor.npz")
    save_params_npz(donor, {'params': params,
                            **{k: v for k, v in variables.items()
                               if k != 'params'}})

    cfg['load_from'] = donor
    cfg['optimizer']['base_lr'] = 0.0       # keep weights untouched
    cfg['optimizer']['total_epochs'] = 1
    cfg['runtime']['eval_interval'] = 10
    state = train_model(cfg, work_dir=work_dir, max_steps=1)
    got = np.asarray(state.params['head']['final']['bias'])
    assert np.allclose(got, 7.0), got


@pytest.mark.slow
def test_train_loop_load_from_nonstrict(tmp_path):
    """Shape-mismatched leaves (e.g. a different-kpt head) are skipped,
    matching mmcv load_checkpoint(strict=False)."""
    import jax
    import jax.numpy as jnp
    from vitpose_tpu.utils.config import load_config
    from vitpose_tpu.train.loop import train_model, build_model_from_cfg
    from vitpose_tpu.utils.checkpoint import save_params_npz

    work_dir = str(tmp_path / "wd")
    cfg = load_config(write_smoke_config(tmp_path, work_dir))
    bb = dict(embed_dim=32, depth=2, num_heads=4)
    cfg['model'] = dict(variant='s', img_size=(64, 48), out_channels=17,
                        head='heatmap', flip_test=True, use_udp=True,
                        backbone_overrides=bb)

    # donor trained with 14 output channels: head final conv mismatches
    donor_model = build_model_from_cfg(dict(cfg['model'], out_channels=14))
    dv = donor_model.init(jax.random.PRNGKey(3),
                          jnp.zeros((1, 64, 48, 3)), train=False)
    dparams = jax.tree.map(lambda a: a, dv['params'])
    cls = dparams['backbone']['cls_or_patch']  \
        if 'cls_or_patch' in dparams['backbone'] else None
    # stamp a recognizable backbone leaf
    pe = dparams['backbone']
    key = next(k for k in pe if 'patch' in k or 'embed' in k)
    leaf_path = key
    donor = str(tmp_path / "donor14.npz")
    save_params_npz(donor, {'params': dparams})

    cfg['load_from'] = donor
    cfg['optimizer']['base_lr'] = 0.0
    cfg['optimizer']['total_epochs'] = 1
    cfg['runtime']['eval_interval'] = 10
    state = train_model(cfg, work_dir=work_dir, max_steps=1)
    # head stays at the 17-channel fresh init (no crash, right shape)
    fb = np.asarray(state.params['head']['final']['bias'])
    assert fb.shape[0] == 17
    # backbone leaf was taken from the donor
    import jax.tree_util as jtu
    got = state.params['backbone'][leaf_path]
    want = dparams['backbone'][leaf_path]
    flat_g = jtu.tree_leaves(got)
    flat_w = jtu.tree_leaves(want)
    assert all(np.allclose(np.asarray(g), np.asarray(w))
               for g, w in zip(flat_g, flat_w))


@pytest.mark.slow
def test_evaluation_interval_key(tmp_path):
    """`evaluation = dict(interval=N)` (the reference's eval-hook knob)
    drives periodic validation, taking precedence over the runtime
    default."""
    import json as _json
    from vitpose_tpu.utils.config import load_config
    from vitpose_tpu.train.loop import train_model

    work_dir = str(tmp_path / "wd")
    cfg = load_config(write_smoke_config(tmp_path, work_dir))
    cfg['model'] = dict(variant='s', img_size=(64, 48), out_channels=17,
                        head='heatmap', flip_test=True, use_udp=True,
                        backbone_overrides=dict(embed_dim=32, depth=2,
                                                num_heads=4))
    cfg['optimizer']['total_epochs'] = 1
    cfg['runtime']['eval_interval'] = 100      # would skip eval
    cfg['evaluation'] = dict(interval=1, metric='mAP', save_best='AP')
    train_model(cfg, work_dir=work_dir)
    recs = [_json.loads(l) for l in
            open(os.path.join(work_dir, 'train.log.json'))]
    ep = [r for r in recs if r.get('mode') == 'epoch']
    assert ep and 'AP' in ep[-1]

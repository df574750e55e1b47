"""tools/test_new.py diagnostics: per-sample OKS matching, overlay drawing,
and tools/train.py's PATH_TO_DATA config substitution."""
import importlib.util
import os

import numpy as np

REF = "/root/reference/tests/data/coco"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    path = os.path.join(REPO, 'tools', f'{name}.py')
    spec = importlib.util.spec_from_file_location(f'tools_{name}', path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _make_dataset():
    from vitpose_tpu.data import topdown_dataset_cls
    return topdown_dataset_cls('coco')(
        f'{REF}/test_coco.json', f'{REF}/', dataset_info='coco',
        image_size=(48, 64), heatmap_size=(12, 16),
        test_mode=True, use_gt_bbox=True)


def test_match_predictions_perfect_and_missing():
    tn = _load('test_new')
    ds = _make_dataset()
    anns = [a for anns in ds.coco.img_to_anns.values() for a in anns
            if not a.get('iscrowd', 0)]
    assert anns, 'fixture has GT annotations'

    # Predictions identical to GT -> every matched pair has OKS ~ 1
    results = []
    for img_id, gts in ds.coco.img_to_anns.items():
        gts = [g for g in gts if not g.get('iscrowd', 0)]
        if not gts:
            continue
        k = ds.num_joints
        preds = np.stack([np.asarray(g['keypoints'], np.float64)
                          .reshape(k, 3) for g in gts])
        boxes = np.zeros((len(gts), 6))
        boxes[:, 5] = 0.9
        results.append(dict(
            preds=preds, boxes=boxes,
            image_paths=[os.path.join(f'{REF}/', ds.id2name[img_id])] * len(gts),
            bbox_ids=list(range(len(gts)))))
    matches = tn.match_predictions(ds, results)
    assert len(matches) == len(anns)
    scored = [m for m in matches if m[0] is not None]
    assert len(scored) == len(anns)
    # GT keypoints at visible joints coincide -> OKS 1; sorted ascending
    oks = np.array([m[2] for m in matches])
    assert (np.diff(oks) >= 0).all()
    labeled = [m for m in matches
               if (np.asarray(m[1]['keypoints'])[2::3] > 0).any()]
    for dt, gt, s in labeled:
        assert s > 0.99, (gt['id'], s)

    # No predictions at all -> every GT appears as an unmatched oks=0 row
    matches0 = tn.match_predictions(ds, [])
    assert len(matches0) == len(anns)
    assert all(m[0] is None and m[2] == 0.0 for m in matches0)


def test_match_predictions_non_coco_returns_none():
    tn = _load('test_new')

    class _MpiiLike:
        num_joints = 16
    assert tn.match_predictions(_MpiiLike(), []) is None


def test_draw_pose_dashed_and_solid():
    tn = _load('test_new')
    img = np.zeros((64, 64, 3), np.uint8)
    kpts = np.array([[10., 10., 1.], [50., 50., 1.], [30., 10., 0.]])
    skeleton = [(0, 1), (1, 2)]
    colors = [(0, 255, 0)] * 3
    out = tn._draw_pose(img.copy(), kpts, skeleton, colors, colors,
                        dashed=True, markers=False)
    solid = tn._draw_pose(img.copy(), kpts, skeleton, colors, colors)
    assert out.sum() > 0 and solid.sum() > 0
    # dashed line covers fewer pixels than solid; low-conf joint untouched
    assert (out > 0).sum() < (solid > 0).sum()


def test_test_new_cli_end_to_end(tmp_path):
    """Full tools/test_new.py run on the COCO fixture: histogram +
    overlays + metrics, via subprocess like the demo CLI tests."""
    import subprocess
    import sys as _sys
    import pytest
    if not os.path.exists(f'{REF}/test_coco.json'):
        pytest.skip('fixture missing')

    # tiny model checkpoint
    from vitpose_tpu.models import TopDownModel, make_config
    from vitpose_tpu.utils.checkpoint import save_params_npz
    import dataclasses as dc
    import jax
    import jax.numpy as jnp
    cfgm = make_config('s', img_size=(64, 48), out_channels=17)
    cfgm = dc.replace(cfgm, backbone=dc.replace(
        cfgm.backbone, embed_dim=32, depth=2, num_heads=4))
    m = TopDownModel(cfgm)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 48, 3)),
               train=False)
    ckpt = tmp_path / 'ckpt.npz'
    save_params_npz(str(ckpt), v)

    cfg = tmp_path / 'cfg.py'
    cfg.write_text(f"""
_base_ = ['{REPO}/vitpose_tpu/configs/base/default_runtime.py']
model = dict(variant='s', img_size=(64, 48), out_channels=17,
             head='heatmap', flip_test=True, use_udp=True,
             post_process='default',
             backbone_overrides=dict(embed_dim=32, depth=2, num_heads=4))
data = dict(dataset='coco', image_size=(48, 64), heatmap_size=(12, 16),
    batch_size=4, canvas_size=640, num_workers=2,
    val=dict(ann_file='{REF}/test_coco.json', img_prefix='{REF}/',
             use_gt_bbox=True))
""")
    vis = tmp_path / 'vis'
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    out = subprocess.run(
        [_sys.executable, 'tools/test_new.py', str(cfg), str(ckpt),
         '--save-dir', str(vis), '--num-images', '5'],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'Number of sorted matches' in out.stdout
    assert 'AP' in out.stdout
    assert (vis / 'test_score_histogram.png').exists()
    assert any(f.name.endswith('.png') and f.name != 'test_score_histogram.png'
               for f in vis.iterdir())


def test_update_tensorboard_logs(tmp_path):
    import importlib.util
    path = os.path.join(REPO, 'tools', 'misc', 'update_tensorboard_logs.py')
    spec = importlib.util.spec_from_file_location('utl', path)
    utl = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(utl)
    wd = tmp_path / 'work_dirs'
    for run, event in (('run_a', 'events.1'), ('run_b', 'events.2')):
        (wd / run / 'tb').mkdir(parents=True)
        (wd / run / 'tb' / event).write_text('x')
    (wd / 'no_tb').mkdir()
    out = tmp_path / 'tensorboard_logs'
    utl.main(str(wd), str(out))
    assert (out / 'run_a' / 'events.1').exists()
    assert (out / 'run_b' / 'events.2').exists()
    assert not (out / 'no_tb').exists()


def test_train_comet_log_tailer(tmp_path):
    """_tail_log_to_comet streams every record including ones written
    right before stop (the text-mode f.tell() bug made it upload
    nothing; the stop path previously dropped the last poll window)."""
    import json
    import threading
    tc = _load('train_comet')

    class FakeExperiment:
        def __init__(self):
            self.metrics = []

        def log_metrics(self, metrics, step=None):
            self.metrics.append((step, metrics))

    log = tmp_path / 'train.log.json'
    with open(log, 'w') as f:
        f.write(json.dumps({'mode': 'train', 'step': 1, 'loss': 0.5}) + '\n')
        f.write('not json\n')                       # tolerated
        f.write(json.dumps({'mode': 'train', 'step': 2, 'loss': 0.4}))
        # incomplete final line (no newline yet)

    exp = FakeExperiment()
    stop = threading.Event()
    t = threading.Thread(target=tc._tail_log_to_comet,
                         args=(exp, str(log), stop))
    t.start()
    import time
    time.sleep(0.3)
    # finish the partial line + add a final record, then stop immediately:
    # the final drain must pick both up
    with open(log, 'a') as f:
        f.write('\n' + json.dumps({'mode': 'epoch', 'epoch': 0,
                                   'AP': 0.7}) + '\n')
    stop.set()
    t.join(timeout=10)
    assert not t.is_alive()
    steps = [s for s, _ in exp.metrics]
    assert 1 in steps and 2 in steps and 0 in steps
    ap = [m for _, m in exp.metrics if 'AP' in m]
    assert ap and ap[0]['AP'] == 0.7


def test_train_path_to_data_substitution():
    tr = _load('train')
    cfg = {'data': {'train': {'ann_file': 'data/coco/train.json',
                              'img_prefix': 'data/coco/'},
                    'nested': [{'p': 'data/x'}],
                    'other': 'dataset'},   # no prefix match -> untouched
           'n': 3}
    tr._replace_path_in_dict(cfg, 'data', '/mnt/ssd')
    assert cfg['data']['train']['ann_file'] == '/mnt/ssd/coco/train.json'
    assert cfg['data']['train']['img_prefix'] == '/mnt/ssd/coco/'
    assert cfg['data']['nested'][0]['p'] == '/mnt/ssd/x'
    assert cfg['data']['other'] == 'dataset'
    assert cfg['n'] == 3

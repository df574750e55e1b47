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

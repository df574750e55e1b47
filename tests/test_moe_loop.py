"""ViTPose+ multi-dataset MoE training on real mixed fixtures
(COCO 17 kpts + AIC 14 kpts + AP10K 17 kpts)."""
import json
import os

import numpy as np
import pytest

DATA = "/root/reference/tests/data"


@pytest.mark.slow
def test_moe_multi_dataset_training(tmp_path):
    from vitpose_tpu.train.loop import train_model

    wd = str(tmp_path / "wd")
    cfg = dict(
        model=dict(variant='s', img_size=(64, 48), out_channels=17,
                   num_experts=3, part_dim=8,
                   num_extra_heads=2, extra_head_channels=(14, 17),
                   head='heatmap', flip_test=True, use_udp=True,
                   backbone_overrides=dict(embed_dim=32, depth=2,
                                           num_heads=4, num_experts=3,
                                           part_dim=8)),
        data=dict(
            image_size=(48, 64), heatmap_size=(12, 16),
            max_num_joints=17, batch_size=4, canvas_size=640,
            num_workers=2,
            train=[
                dict(dataset='coco', dataset_idx=0,
                     ann_file=f'{DATA}/coco/test_coco.json',
                     img_prefix=f'{DATA}/coco/'),
                dict(dataset='aic', dataset_idx=1,
                     ann_file=f'{DATA}/aic/test_aic.json',
                     img_prefix=f'{DATA}/aic/'),
                dict(dataset='ap10k', dataset_idx=2,
                     ann_file=f'{DATA}/ap10k/test_ap10k.json',
                     img_prefix=f'{DATA}/ap10k/'),
            ],
            val=dict(dataset='coco',
                     ann_file=f'{DATA}/coco/test_coco.json',
                     img_prefix=f'{DATA}/coco/', use_gt_bbox=True),
        ),
        target=dict(encoding='UDP', sigma=1.5),
        optimizer=dict(base_lr=1e-3, warmup_iters=2,
                       decay_epochs=(100, 200), total_epochs=1),
        runtime=dict(work_dir=wd, log_interval=1, eval_interval=1,
                     ckpt_interval=1, seed=0),
    )
    state = train_model(cfg, work_dir=wd)
    assert state is not None
    records = [json.loads(l)
               for l in open(os.path.join(wd, 'train.log.json'))]
    train_recs = [r for r in records if r.get('mode') == 'train']
    # multiple datasets appeared (ap10k's fixture is too small to fill a
    # batch under drop_last)
    seen = {r['dataset'] for r in train_recs}
    assert {0, 1}.issubset(seen), seen
    # loss masking: a dataset-1 batch must put all its loss in loss_1
    r1 = next(r for r in train_recs if r['dataset'] == 1)
    assert r1['loss_1'] > 0 and r1['loss_0'] == 0 and r1['loss_2'] == 0
    assert all(np.isfinite(r['heatmap_loss']) for r in train_recs)
    # per-dataset losses present
    assert 'loss_0' in train_recs[0] and 'loss_2' in train_recs[0]
    epoch_recs = [r for r in records if r.get('mode') == 'epoch']
    assert 'AP' in epoch_recs[-1]

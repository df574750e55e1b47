#!/usr/bin/env python
"""End-to-end convergence sanity: train ViTPose-S-tiny from scratch on the
12-person COCO fixture and watch AP rise through the full stack (loader ->
device pipeline -> training -> flip-test eval -> decode -> COCOeval).

Round-1 result on one TPU v5e chip (1200 epochs, ~25 min):
AP 0 -> 0.47 @ep500 -> 0.71 @ep1000+, with AP@0.5 = AP@0.75 = 1.0.
Round-2 result (same recipe, after the pipeline-fidelity fixes — train
center jitter, half-body transform, aug corrections): AP 0.72 @ep500 ->
0.81 @ep600 -> **1.00 @ep1000 and held through ep1200** — a perfect
overfit through loader -> device pipeline -> train step -> flip-test
eval -> decode -> COCOeval on hardware.
"""
import sys, json
import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from vitpose_tpu.train.loop import train_model

REF = "/root/reference/tests/data/coco"
cfg = dict(
    model=dict(variant='s', img_size=(128, 96), out_channels=17,
               head='heatmap', flip_test=True, use_udp=True,
               backbone_overrides=dict(embed_dim=128, depth=4, num_heads=4, drop_path_rate=0.0)),
    data=dict(dataset='coco', image_size=(96, 128), heatmap_size=(24, 32),
              batch_size=12, canvas_size=640, num_workers=1,
              train=dict(ann_file=f'{REF}/test_coco.json', img_prefix=f'{REF}/'),
              val=dict(ann_file=f'{REF}/test_coco.json', img_prefix=f'{REF}/',
                       use_gt_bbox=True),
              aug=dict(flip_prob=0.3, half_body_prob=0.0, scale_factor=0.15,
                       rot_factor=15.0, rot_prob=0.3)),
    target=dict(encoding='UDP', sigma=2.0),
    optimizer=dict(base_lr=5e-3, warmup_iters=20, decay_epochs=(900, 1100),
                   total_epochs=1200, layer_decay_rate=0.9),
    runtime=dict(work_dir='work_dirs/overfit_sanity', log_interval=50,
                 eval_interval=100, ckpt_interval=1000, seed=0),
)
train_model(cfg, work_dir='work_dirs/overfit_sanity')

# ViTPose+ -B: 6-dataset multi-task MoE training (counterpart of reference
# configs/.../vitPose+_base_coco+aic+mpii+ap10k+apt36k+wholebody_256x192_udp.py)
import os as _os
_ROOT = _os.environ.get('POSE_DATA_ROOT', '/data')

_base_ = ['../base/default_runtime.py']

model = dict(
    variant='b',
    img_size=(256, 192),
    out_channels=17,                 # main head: COCO
    num_experts=6,
    part_dim=192,
    num_extra_heads=5,
    extra_head_channels=(14, 16, 17, 17, 133),  # aic mpii ap10k apt36k wb
    head='heatmap',
    dtype='bfloat16',
    flip_test=True,
    post_process='default',
    use_udp=True,
)

data = dict(
    image_size=(192, 256),
    heatmap_size=(48, 64),
    max_num_joints=133,
    batch_size=128,
    canvas_size=640,
    num_workers=16,
    train=[
        dict(dataset='coco', dataset_idx=0,
             ann_file=f'{_ROOT}/coco/annotations/person_keypoints_train2017.json',
             img_prefix=f'{_ROOT}/coco/train2017/'),
        dict(dataset='aic', dataset_idx=1,
             ann_file=f'{_ROOT}/aic/annotations/aic_train.json',
             img_prefix=f'{_ROOT}/aic/train/'),
        dict(dataset='mpii', dataset_idx=2,
             ann_file=f'{_ROOT}/mpii/annotations/mpii_train.json',
             img_prefix=f'{_ROOT}/mpii/images/'),
        dict(dataset='ap10k', dataset_idx=3,
             ann_file=f'{_ROOT}/ap10k/annotations/ap10k_train.json',
             img_prefix=f'{_ROOT}/ap10k/data/'),
        dict(dataset='ap10k', dataset_idx=4,   # apt36k shares the schema
             ann_file=f'{_ROOT}/apt36k/annotations/apt36k_train.json',
             img_prefix=f'{_ROOT}/apt36k/data/'),
        dict(dataset='coco_wholebody', dataset_idx=5,
             ann_file=f'{_ROOT}/coco/annotations/coco_wholebody_train_v1.0.json',
             img_prefix=f'{_ROOT}/coco/train2017/'),
    ],
    val=dict(dataset='coco',
             ann_file=f'{_ROOT}/coco/annotations/person_keypoints_val2017.json',
             img_prefix=f'{_ROOT}/coco/val2017/',
             use_gt_bbox=False,
             bbox_file=f'{_ROOT}/coco/detections/'
                       'COCO_val2017_detections_AP_H_56_person.json'),
    aug=dict(flip_prob=0.5, half_body_prob=0.3, scale_factor=0.5,
             rot_factor=40.0, rot_prob=0.6),
)
target = dict(encoding='UDP', sigma=2.0)
optimizer = dict(base_lr=1e-3, weight_decay=0.1, layer_decay_rate=0.75,
                 warmup_iters=500, warmup_ratio=1e-3,
                 decay_epochs=(170, 200), total_epochs=210,
                 grad_clip_norm=1.0)
runtime = dict(work_dir='work_dirs/vitpose_plus_b_6datasets')

# ViTPose-B on COCO-WholeBody (133 keypoints)
import os as _os
_ROOT = _os.environ.get('COCO_ROOT', '/data/coco')
_base_ = ['../base/default_runtime.py']
model = dict(variant='b', img_size=(256, 192), out_channels=133,
             head='heatmap', dtype='bfloat16', flip_test=True,
             post_process='default', use_udp=False, shift_heatmap=True,
             backbone_overrides=dict(fused_attention=True))
data = dict(dataset='coco_wholebody',
            image_size=(192, 256), heatmap_size=(48, 64),
            batch_size=64, canvas_size=640, num_workers=8,
            train=dict(ann_file=f'{_ROOT}/annotations/'
                                'coco_wholebody_train_v1.0.json',
                       img_prefix=f'{_ROOT}/train2017/'),
            val=dict(ann_file=f'{_ROOT}/annotations/'
                              'coco_wholebody_val_v1.0.json',
                     img_prefix=f'{_ROOT}/val2017/', use_gt_bbox=True),
            aug=dict(flip_prob=0.5, half_body_prob=0.3, scale_factor=0.5,
                     rot_factor=40.0, rot_prob=0.6))
target = dict(encoding='MSRA', sigma=2.0)
optimizer = dict(base_lr=5e-4, weight_decay=0.1, layer_decay_rate=0.75,
                 warmup_iters=500, decay_epochs=(170, 200),
                 total_epochs=210, grad_clip_norm=1.0)
runtime = dict(work_dir='work_dirs/vitpose_b_wholebody')

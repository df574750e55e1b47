# ViTPose-B on InterHand2.6M 2D (21 kpts, 'all' split)
# (reference: configs/hand/2d_kpt_sview_rgb_img/topdown_heatmap/interhand2d/
#  ViTPose_base_interhand2d_all_256x192.py)
import os as _os
_ROOT = _os.environ.get('INTERHAND_ROOT', '/data/interhand2.6m')
_base_ = ['../base/default_runtime.py']
model = dict(variant='b', img_size=(256, 192), out_channels=21,
             head='heatmap', dtype='bfloat16', flip_test=True,
             post_process='default', use_udp=False, shift_heatmap=True,
             backbone_overrides=dict(fused_attention=True))
data = dict(dataset='interhand2d',
            image_size=(192, 256), heatmap_size=(48, 64),
            batch_size=64, canvas_size=640, num_workers=8,
            train=dict(ann_file=f'{_ROOT}/annotations/all/'
                                'InterHand2.6M_train_coco.json',
                       img_prefix=f'{_ROOT}/images/train/'),
            val=dict(ann_file=f'{_ROOT}/annotations/all/'
                              'InterHand2.6M_val_coco.json',
                     img_prefix=f'{_ROOT}/images/val/', use_gt_bbox=True),
            aug=dict(flip_prob=0.5, half_body_prob=0.0, scale_factor=0.3,
                     rot_factor=90.0, rot_prob=0.6))
target = dict(encoding='MSRA', sigma=2.0)
evaluation = dict(metric=['PCK', 'AUC', 'EPE'], save_best='AUC')
optimizer = dict(base_lr=5e-4, weight_decay=0.1,
                 layer_decay_rate=0.75, warmup_iters=500,
                 decay_epochs=(170, 200), total_epochs=210,
                 grad_clip_norm=1.0)
runtime = dict(work_dir='work_dirs/vitpose_b_interhand2d_all')

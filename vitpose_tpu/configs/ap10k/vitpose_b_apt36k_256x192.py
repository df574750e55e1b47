# ViTPose-B on APT-36K animal pose (17 kpts, AP10K-format annotations;
# reference trains APT-36K through the AnimalAP10KDataset class)
import os as _os
_ROOT = _os.environ.get('APT36K_ROOT', '/data/apt36k')
_base_ = ['../base/default_runtime.py']
model = dict(variant='b', img_size=(256, 192), out_channels=17,
             head='heatmap', dtype='bfloat16', flip_test=True,
             post_process='default', use_udp=False, shift_heatmap=True,
             backbone_overrides=dict(fused_attention=True))
data = dict(dataset='ap10k', image_size=(192, 256), heatmap_size=(48, 64),
            batch_size=64, canvas_size=1024, num_workers=8,
            train=dict(ann_file=f'{_ROOT}/annotations/'
                                'apt36k_train.json',
                       img_prefix=f'{_ROOT}/data/'),
            val=dict(ann_file=f'{_ROOT}/annotations/apt36k_val.json',
                     img_prefix=f'{_ROOT}/data/', use_gt_bbox=True),
            aug=dict(flip_prob=0.5, half_body_prob=0.3, scale_factor=0.5,
                     rot_factor=40.0, rot_prob=0.6))
target = dict(encoding='MSRA', sigma=2.0)
evaluation = dict(metric=['mAP'], save_best='AP')
optimizer = dict(base_lr=5e-4, weight_decay=0.1, layer_decay_rate=0.75,
                 warmup_iters=500, decay_epochs=(170, 200),
                 total_epochs=210, grad_clip_norm=1.0)
runtime = dict(work_dir='work_dirs/vitpose_b_apt36k')

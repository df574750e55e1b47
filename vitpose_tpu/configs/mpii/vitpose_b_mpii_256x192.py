# ViTPose-B on MPII (16 keypoints), PCKh evaluation
import os as _os
_ROOT = _os.environ.get('MPII_ROOT', '/data/mpii')
_base_ = ['../base/default_runtime.py']
model = dict(variant='b', img_size=(256, 192), out_channels=16,
             head='heatmap', dtype='bfloat16', flip_test=True,
             post_process='default', use_udp=True,
             backbone_overrides=dict(fused_attention=True))
data = dict(dataset='mpii',
            image_size=(192, 256), heatmap_size=(48, 64),
            batch_size=64, canvas_size=1440, num_workers=8,
            train=dict(ann_file=f'{_ROOT}/annotations/mpii_train.json',
                       img_prefix=f'{_ROOT}/images/'),
            val=dict(ann_file=f'{_ROOT}/annotations/mpii_val.json',
                     img_prefix=f'{_ROOT}/images/'),
            aug=dict(flip_prob=0.5, half_body_prob=0.0, scale_factor=0.25,
                     rot_factor=30.0, rot_prob=0.6))
target = dict(encoding='UDP', sigma=2.0)
optimizer = dict(base_lr=5e-4, weight_decay=0.1, layer_decay_rate=0.75,
                 warmup_iters=500, decay_epochs=(170, 200),
                 total_epochs=210, grad_clip_norm=1.0)
runtime = dict(work_dir='work_dirs/vitpose_b_mpii', save_best='PCKh')

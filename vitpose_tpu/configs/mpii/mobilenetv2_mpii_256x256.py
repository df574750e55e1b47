# MobileNetV2 on MPII (reference:
# configs/.../topdown_heatmap/mpii/mobilenetv2_mpii_256x256.py).
import os as _os
_ROOT = _os.environ.get('MPII_ROOT', '/data/mpii')
_base_ = ['../base/default_runtime.py']

model = dict(
    backbone_type='mobilenet_v2',
    backbone_overrides=dict(dtype='bfloat16', widen_factor=1.0),
    img_size=(256, 256),
    out_channels=16,
    head='heatmap',
    deconv_filters=(256, 256, 256),
    deconv_kernels=(4, 4, 4),
    dtype='bfloat16',
    flip_test=True,
    post_process='default',
    use_udp=False,
    shift_heatmap=True,
)
data = dict(dataset='mpii',
            image_size=(256, 256), heatmap_size=(64, 64),
            batch_size=64, canvas_size=1440, num_workers=8,
            train=dict(ann_file=f'{_ROOT}/annotations/mpii_train.json',
                       img_prefix=f'{_ROOT}/images/'),
            val=dict(ann_file=f'{_ROOT}/annotations/mpii_val.json',
                     img_prefix=f'{_ROOT}/images/'),
            aug=dict(flip_prob=0.5, half_body_prob=0.0, scale_factor=0.25,
                     rot_factor=30.0, rot_prob=0.6))
target = dict(encoding='MSRA', sigma=2.0)
optimizer = dict(base_lr=5e-4, warmup_iters=500, decay_epochs=(170, 200),
                 total_epochs=210)
runtime = dict(work_dir='work_dirs/mobilenetv2_mpii_256x256',
               save_best='PCKh')

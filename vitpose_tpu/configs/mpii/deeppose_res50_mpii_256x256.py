# DeepPose ResNet-50 coordinate regression on MPII (reference:
# configs/body/2d_kpt_sview_rgb_img/deeppose/mpii/res50_mpii_256x256.py)
import os as _os
_ROOT = _os.environ.get('MPII_ROOT', '/data/mpii')
_base_ = ['../base/default_runtime.py']

model = dict(
    backbone_type='resnet',
    backbone_overrides=dict(depth=50),
    img_size=(256, 256),
    out_channels=16,
    head='regression',
    target_type='Regression',
    reg_loss='smooth_l1',
    flip_test=True,
    use_udp=False,
)
data = dict(dataset='mpii',
            image_size=(256, 256), heatmap_size=(64, 64),
            batch_size=64, canvas_size=1440, num_workers=8,
            train=dict(ann_file=f'{_ROOT}/annotations/mpii_train.json',
                       img_prefix=f'{_ROOT}/images/'),
            val=dict(ann_file=f'{_ROOT}/annotations/mpii_val.json',
                     img_prefix=f'{_ROOT}/images/'),
            aug=dict(flip_prob=0.5, half_body_prob=0.0, scale_factor=0.5,
                     rot_factor=40.0, rot_prob=0.6))
target = dict(encoding='MSRA', sigma=2.0)
optimizer = dict(base_lr=5e-4, warmup_iters=500, decay_epochs=(170, 200),
                 total_epochs=210)
runtime = dict(work_dir='work_dirs/deeppose_res50_mpii_256x256',
               save_best='PCKh')

# SimpleBaseline ResNet-50 on ATRW amur tiger (15 kpts, OKS mAP)
# (reference: configs/animal/2d_kpt_sview_rgb_img/topdown_heatmap/atrw/res50_atrw_256x256.py)
import os as _os
_ROOT = _os.environ.get('ATRW_ROOT', '/data/atrw')
_base_ = ['../base/default_runtime.py']

model = dict(
    backbone_type='resnet',
    backbone_overrides=dict(depth=50),
    img_size=(256, 256),
    out_channels=15,
    head='heatmap',
    deconv_filters=(256, 256, 256),
    deconv_kernels=(4, 4, 4),
    flip_test=True,
    post_process='default',
    use_udp=False,
    shift_heatmap=True,
    modulate_kernel=11,
)
data = dict(
    dataset='atrw',
    image_size=(256, 256), heatmap_size=(64, 64),
    batch_size=64, canvas_size=1024, num_workers=8,
    train=dict(ann_file=f'{_ROOT}/annotations/keypoint_train.json',
               img_prefix=f'{_ROOT}/images/'),
    val=dict(ann_file=f'{_ROOT}/annotations/keypoint_val.json',
             img_prefix=f'{_ROOT}/images/', use_gt_bbox=True),
    aug=dict(flip_prob=0.5, half_body_prob=0.0, scale_factor=0.5,
             rot_factor=40.0, rot_prob=0.6),
)
target = dict(encoding='MSRA', sigma=2.0)
evaluation = dict(metric=['mAP'], save_best='AP')
optimizer = dict(base_lr=0.0005, warmup_iters=500, decay_epochs=(170, 200),
                 total_epochs=210)
runtime = dict(work_dir='work_dirs/res50_atrw_256x256')

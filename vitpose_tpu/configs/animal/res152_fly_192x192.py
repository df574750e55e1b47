# SimpleBaseline ResNet-152 on Vinegar Fly (32 kpts)
# (reference: configs/animal/2d_kpt_sview_rgb_img/topdown_heatmap/fly/res152_fly_192x192.py)
import os as _os
_ROOT = _os.environ.get('FLY_ROOT', '/data/fly')
_base_ = ['../base/default_runtime.py']

model = dict(
    backbone_type='resnet',
    backbone_overrides=dict(depth=152),
    img_size=(192, 192),
    out_channels=32,
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
    dataset='fly',
    image_size=(192, 192), heatmap_size=(48, 48),
    batch_size=64, canvas_size=640, num_workers=8,
    train=dict(ann_file=f'{_ROOT}/annotations/fly_train.json',
               img_prefix=f'{_ROOT}/images/'),
    val=dict(ann_file=f'{_ROOT}/annotations/fly_test.json',
             img_prefix=f'{_ROOT}/images/', use_gt_bbox=True),
    aug=dict(flip_prob=0.5, half_body_prob=0.0, scale_factor=0.3,
             rot_factor=90.0, rot_prob=0.6),
)
target = dict(encoding='MSRA', sigma=2.0)
evaluation = dict(metric=['PCK', 'AUC', 'EPE'], save_best='AUC')
optimizer = dict(base_lr=0.0005, warmup_iters=500, decay_epochs=(170, 200),
                 total_epochs=210)
runtime = dict(work_dir='work_dirs/res152_fly_192x192')

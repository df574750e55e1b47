# HRNet-W32 on Halpe full-body (136 kpts, OKS mAP)
# (reference: configs/wholebody/2d_kpt_sview_rgb_img/topdown_heatmap/
#  halpe/hrnet_w32_halpe_256x192.py)
import os as _os
_ROOT = _os.environ.get('HALPE_ROOT', '/data/halpe')
_COCO = _os.environ.get('COCO_ROOT', '/data/coco')
_base_ = ['../base/default_runtime.py']

model = dict(
    backbone_type='hrnet',
    backbone_overrides=dict(width=32),
    img_size=(256, 192),
    out_channels=136,
    head='heatmap',
    deconv_filters=(),
    deconv_kernels=(),
    flip_test=True,
    post_process='default',
    use_udp=False,
    shift_heatmap=True,
    modulate_kernel=11,
)
data = dict(
    dataset='halpe',
    image_size=(192, 256), heatmap_size=(48, 64),
    batch_size=64, canvas_size=640, num_workers=8,
    train=dict(ann_file=f'{_ROOT}/annotations/'
                        'halpe_train_v1.json',
               img_prefix=f'{_ROOT}/hico_20160224_det/images/train2015/'),
    val=dict(ann_file=f'{_ROOT}/annotations/halpe_val_v1.json',
             img_prefix=f'{_COCO}/val2017/',
             use_gt_bbox=False,
             bbox_file=f'{_COCO}/detections/'
                       'COCO_val2017_detections_AP_H_56_person.json'),
    aug=dict(flip_prob=0.5, half_body_prob=0.3, scale_factor=0.5,
             rot_factor=40.0, rot_prob=0.6),
)
target = dict(encoding='MSRA', sigma=2.0)
evaluation = dict(interval=10, metric=['mAP'], save_best='AP')
optimizer = dict(base_lr=5e-4, warmup_iters=500, decay_epochs=(170, 200),
                 total_epochs=210)
runtime = dict(work_dir='work_dirs/hrnet_w32_halpe_256x192')

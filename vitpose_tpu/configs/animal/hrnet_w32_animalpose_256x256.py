# HRNet-W32 on Animal-Pose (20 kpts, OKS mAP)
# (reference: configs/animal/2d_kpt_sview_rgb_img/topdown_heatmap/animalpose/hrnet_w32_animalpose_256x256.py)
import os as _os
_ROOT = _os.environ.get('ANIMALPOSE_ROOT', '/data/animalpose')
_base_ = ['../base/default_runtime.py']

model = dict(
    backbone_type='hrnet',
    backbone_overrides=dict(width=32, stage_modules=(1, 4, 3)),
    img_size=(256, 256),
    out_channels=20,
    head='heatmap',
    deconv_filters=(),
    deconv_kernels=(),
    final_kernel=1,
    flip_test=True,
    post_process='default',
    use_udp=False,
    shift_heatmap=True,
    modulate_kernel=11,
)
data = dict(
    dataset='animalpose',
    image_size=(256, 256), heatmap_size=(64, 64),
    batch_size=64, canvas_size=1024, num_workers=8,
    train=dict(ann_file=f'{_ROOT}/annotations/animalpose_train.json',
               img_prefix=f'{_ROOT}/'),
    val=dict(ann_file=f'{_ROOT}/annotations/animalpose_val.json',
             img_prefix=f'{_ROOT}/', use_gt_bbox=True),
    aug=dict(flip_prob=0.5, half_body_prob=0.0, scale_factor=0.5,
             rot_factor=40.0, rot_prob=0.6),
)
target = dict(encoding='MSRA', sigma=2.0)
evaluation = dict(metric=['mAP'], save_best='AP')
optimizer = dict(base_lr=0.0005, warmup_iters=500, decay_epochs=(170, 200),
                 total_epochs=210)
runtime = dict(work_dir='work_dirs/hrnet_w32_animalpose_256x256')

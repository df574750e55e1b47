# HRNetV2-W18 on COCO-WholeBody-Hand crops (21 kpts, PCK/AUC/EPE)
# (reference: configs/hand/2d_kpt_sview_rgb_img/topdown_heatmap/coco_wholebody_hand/hrnetv2_w18_coco_wholebody_hand_256x256.py)
import os as _os
_ROOT = _os.environ.get('COCO_ROOT', '/data/coco')
_base_ = ['../base/default_runtime.py']

model = dict(
    backbone_type='hrnetv2',
    backbone_overrides=dict(width=18, stage_modules=(1, 4, 3)),
    img_size=(256, 256),
    out_channels=21,
    head='heatmap',
    deconv_filters=(),
    deconv_kernels=(),
    head_extra_convs=(1,),
    final_kernel=1,
    flip_test=True,
    post_process='default',
    use_udp=False,
    shift_heatmap=True,
    modulate_kernel=11,
)
data = dict(
    dataset='coco_wholebody_hand',
    image_size=(256, 256), heatmap_size=(64, 64),
    batch_size=64, canvas_size=640, num_workers=8,
    train=dict(ann_file=f'{_ROOT}/annotations/'
                        'coco_wholebody_train_v1.0.json',
               img_prefix=f'{_ROOT}/train2017/'),
    val=dict(ann_file=f'{_ROOT}/annotations/coco_wholebody_val_v1.0.json',
             img_prefix=f'{_ROOT}/val2017/', use_gt_bbox=True),
    aug=dict(flip_prob=0.5, half_body_prob=0.0, scale_factor=0.3,
             rot_factor=90.0, rot_prob=0.6),
)
target = dict(encoding='MSRA', sigma=2.0)
evaluation = dict(metric=['PCK', 'AUC', 'EPE'], save_best='AUC')
optimizer = dict(base_lr=5e-4, warmup_iters=500, decay_epochs=(170, 200),
                 total_epochs=210)
runtime = dict(work_dir='work_dirs/hrnetv2_w18_coco_wholebody_hand_256x256')

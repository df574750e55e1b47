# res50_interhand2d_machine_256x256 (reference: configs/hand/2d_kpt_sview_rgb_img/topdown_heatmap/interhand2d/res50_interhand2d_machine_256x256.py;
# annotations in the coco-format conversion produced by the data-prep
# tooling)
import os as _os
_ROOT = _os.environ.get('INTERHAND_ROOT', '/data/interhand2.6m')
_base_ = ['../base/default_runtime.py']

model = dict(
    backbone_type='resnet',
    backbone_overrides=dict(depth=50),
    img_size=(256, 256),
    out_channels=21,
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
    dataset='interhand2d',
    image_size=(256, 256), heatmap_size=(64, 64),
    batch_size=64, canvas_size=640, num_workers=8,
    train=dict(ann_file=f'{_ROOT}/annotations/machine/'
                        'InterHand2.6M_train_coco.json',
               img_prefix=f'{_ROOT}/images/train/'),
    val=dict(ann_file=f'{_ROOT}/annotations/machine/'
                      'InterHand2.6M_val_coco.json',
             img_prefix=f'{_ROOT}/images/val/', use_gt_bbox=True),
    aug=dict(flip_prob=0.5, half_body_prob=0.0, scale_factor=0.3,
             rot_factor=90.0, rot_prob=0.6),
)
target = dict(encoding='MSRA', sigma=2.0)
evaluation = dict(metric=['PCK', 'AUC', 'EPE'], save_best='AUC')
optimizer = dict(base_lr=5e-4, warmup_iters=500, decay_epochs=(170, 200),
                 total_epochs=210)
runtime = dict(work_dir='work_dirs/res50_interhand2d_machine_256x256')

# SimpleBaseline ResNet-50 on MPII-TRB (40 kpts incl. contour, PCKh)
# (reference: configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/mpii_trb/
#  res50_mpii_trb_256x256.py)
import os as _os
_ROOT = _os.environ.get('MPII_ROOT', '/data/mpii')
_base_ = ['../base/default_runtime.py']

model = dict(
    backbone_type='resnet',
    backbone_overrides=dict(depth=50),
    img_size=(256, 256),
    out_channels=40,
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
    dataset='mpii_trb',
    image_size=(256, 256), heatmap_size=(64, 64),
    batch_size=64, canvas_size=1280, num_workers=8,
    train=dict(ann_file=f'{_ROOT}/annotations/mpii_trb_train.json',
               img_prefix=f'{_ROOT}/images/'),
    val=dict(ann_file=f'{_ROOT}/annotations/mpii_trb_val.json',
             img_prefix=f'{_ROOT}/images/', use_gt_bbox=True),
    aug=dict(flip_prob=0.5, half_body_prob=0.3, scale_factor=0.5,
             rot_factor=40.0, rot_prob=0.6),
)
target = dict(encoding='MSRA', sigma=2.0)
evaluation = dict(interval=10, metric=['PCKh'], save_best='PCKh')
optimizer = dict(base_lr=5e-4, warmup_iters=500, decay_epochs=(170, 200),
                 total_epochs=210)
runtime = dict(work_dir='work_dirs/res50_mpii_trb_256x256')

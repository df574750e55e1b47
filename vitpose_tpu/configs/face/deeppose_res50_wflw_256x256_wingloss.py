# DeepPose ResNet-50 regression on WFLW with Wing loss (reference:
# configs/face/2d_kpt_sview_rgb_img/deeppose/wflw/
# res50_wflw_256x256_wingloss.py)
import os as _os
_ROOT = _os.environ.get('WFLW_ROOT', '/data/wflw')
_base_ = ['../base/default_runtime.py']

model = dict(
    backbone_type='resnet',
    backbone_overrides=dict(depth=50),
    img_size=(256, 256),
    out_channels=98,
    head='regression',
    target_type='Regression',
    reg_loss='wing',
    flip_test=True,
    use_udp=False,
)
data = dict(
    dataset='wflw',
    image_size=(256, 256), heatmap_size=(64, 64),
    batch_size=64, canvas_size=1024, num_workers=8,
    train=dict(ann_file=f'{_ROOT}/annotations/face_landmarks_wflw_train.json',
               img_prefix=f'{_ROOT}/images/'),
    val=dict(ann_file=f'{_ROOT}/annotations/face_landmarks_wflw_test.json',
             img_prefix=f'{_ROOT}/images/', use_gt_bbox=True),
    aug=dict(flip_prob=0.5, half_body_prob=0.0, scale_factor=0.25,
             rot_factor=30.0, rot_prob=0.6),
)
target = dict(encoding='MSRA', sigma=2.0)
evaluation = dict(metric=['NME'], save_best='NME', save_best_mode='min')
optimizer = dict(base_lr=5e-4, warmup_iters=500, decay_epochs=(170, 200),
                 total_epochs=210)
runtime = dict(work_dir='work_dirs/deeppose_res50_wflw_256x256_wingloss')

# DeepPose ResNet-50 coordinate regression on COCO (reference:
# configs/body/2d_kpt_sview_rgb_img/deeppose/coco/res50_coco_256x192.py):
# backbone -> GAP -> fc -> [K, 2] normalized coords, SmoothL1 loss,
# flip test via fliplr_regression.
_base_ = ['../base/default_runtime.py', '../base/coco_data.py']

model = dict(
    backbone_type='resnet',
    backbone_overrides=dict(depth=50),
    img_size=(256, 192),
    out_channels=17,
    head='regression',
    target_type='Regression',
    reg_loss='smooth_l1',
    flip_test=True,
    use_udp=False,
)
target = dict(encoding='MSRA', sigma=2.0)
optimizer = dict(base_lr=5e-4, warmup_iters=500, decay_epochs=(170, 200),
                 total_epochs=210)
runtime = dict(work_dir='work_dirs/deeppose_res50_coco_256x192')

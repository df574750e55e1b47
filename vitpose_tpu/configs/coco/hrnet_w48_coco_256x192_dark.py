# HRNet-W48 top-down COCO at 256x192 + DARK (reference:
# configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/coco/hrnet_w48_coco_256x192_dark.py)
_base_ = ['../base/default_runtime.py', '../base/coco_data.py']

model = dict(
    backbone_type='hrnet',
    backbone_overrides=dict(width=48, stage_modules=(1, 4, 3),
                            dtype='bfloat16'),
    img_size=(256, 192),
    out_channels=17,
    head='heatmap',
    deconv_filters=(),
    dtype='bfloat16',
    flip_test=True,
    post_process='unbiased',
    modulate_kernel=11,
    use_udp=False,
    shift_heatmap=True,
)
data = dict(image_size=(192, 256), heatmap_size=(48, 64))
target = dict(encoding='MSRA', sigma=2.0, unbiased=True)
optimizer = dict(base_lr=5e-4, warmup_iters=500, decay_epochs=(170, 200),
                 total_epochs=210)
runtime = dict(work_dir='work_dirs/hrnet_w48_coco_256x192_dark')

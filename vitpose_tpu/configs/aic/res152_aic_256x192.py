# res152_aic_256x192 (reference: configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/aic/res152_aic_256x192.py)
_base_ = ['../base/default_runtime.py', '../base/aic_data.py']

model = dict(
    backbone_type='resnet',
    backbone_overrides=dict(depth=152),
    img_size=(256, 192),
    out_channels=14,
    head='heatmap',
    deconv_filters=(256, 256, 256),
    deconv_kernels=(4, 4, 4),
    dtype='bfloat16',
    flip_test=True,
    post_process='default',
    use_udp=False,
    shift_heatmap=True,
)
data = dict(image_size=(192, 256), heatmap_size=(48, 64))
optimizer = dict(base_lr=5e-4, warmup_iters=500, decay_epochs=(170, 200),
                 total_epochs=210)
runtime = dict(work_dir='work_dirs/res152_aic_256x192')

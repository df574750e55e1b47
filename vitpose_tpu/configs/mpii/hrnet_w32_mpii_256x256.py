# hrnet_w32_mpii_256x256 (reference: configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/mpii/hrnet_w32_mpii_256x256.py)
_base_ = ['../base/default_runtime.py', '../base/mpii_data.py']

model = dict(
    backbone_type='hrnet',
    backbone_overrides=dict(width=32, stage_modules=(1, 4, 3),
                            dtype='bfloat16'),
    img_size=(256, 256),
    out_channels=16,
    head='heatmap',
    deconv_filters=(),
    dtype='bfloat16',
    flip_test=True,
    post_process='default',
    use_udp=False,
    shift_heatmap=True,
)
data = dict(image_size=(256, 256), heatmap_size=(64, 64))
optimizer = dict(base_lr=5e-4, warmup_iters=500, decay_epochs=(170, 200),
                 total_epochs=210)
runtime = dict(work_dir='work_dirs/hrnet_w32_mpii_256x256')

# hrnet_w48_deepfashion_upper_256x192 (reference: configs/fashion/2d_kpt_sview_rgb_img/topdown_heatmap/deepfashion/hrnet_w48_deepfashion_upper_256x192.py)
_base_ = ['../fashion/res50_deepfashion_upper_256x192.py']

model = dict(
    _delete_=True,
    backbone_type='hrnet',
    backbone_overrides=dict(width=48, stage_modules=(1, 4, 3),
                            dtype='bfloat16'),
    img_size=(256, 192),
    out_channels=6,
    head='heatmap',
    deconv_filters=(),
    dtype='bfloat16',
    flip_test=True,
    post_process='default',
    use_udp=False,
    shift_heatmap=True,
)
runtime = dict(work_dir='work_dirs/hrnet_w48_deepfashion_upper_256x192')

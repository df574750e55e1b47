# hrnet_w32_macaque_256x192 (reference: configs/animal/2d_kpt_sview_rgb_img/topdown_heatmap/macaque/hrnet_w32_macaque_256x192.py)
_base_ = ['../animal/res50_macaque_256x192.py']

model = dict(
    _delete_=True,
    backbone_type='hrnet',
    backbone_overrides=dict(width=32, stage_modules=(1, 4, 3),
                            dtype='bfloat16'),
    img_size=(256, 192),
    out_channels=17,
    head='heatmap',
    deconv_filters=(),
    dtype='bfloat16',
    flip_test=True,
    post_process='default',
    use_udp=False,
    shift_heatmap=True,
)
runtime = dict(work_dir='work_dirs/hrnet_w32_macaque_256x192')

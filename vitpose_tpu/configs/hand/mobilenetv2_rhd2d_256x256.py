# mobilenetv2_rhd2d_256x256 (reference: configs/hand/2d_kpt_sview_rgb_img/topdown_heatmap/rhd2d/mobilenetv2_rhd2d_256x256.py)
_base_ = ['../hand/hrnetv2_w18_rhd2d_256x256.py']

model = dict(
    _delete_=True,
    backbone_type='mobilenet_v2',
    backbone_overrides=dict(dtype='bfloat16', widen_factor=1.0),
    img_size=(256, 256),
    out_channels=21,
    head='heatmap',
    deconv_filters=(256, 256, 256),
    deconv_kernels=(4, 4, 4),
    dtype='bfloat16',
    flip_test=True,
    post_process='default',
    use_udp=False,
    shift_heatmap=True,
    modulate_kernel=11,
)
runtime = dict(work_dir='work_dirs/mobilenetv2_rhd2d_256x256')

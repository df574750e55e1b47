# HRNetV2-W18 on RHD 2D (21 kpts; reference:
# configs/hand/2d_kpt_sview_rgb_img/topdown_heatmap/rhd2d/hrnetv2_w18_rhd2d_256x256.py)
_base_ = ['../hand/res50_rhd2d_256x256.py']

model = dict(
    _delete_=True,
    backbone_type='hrnetv2',
    backbone_overrides=dict(width=18, stage_modules=(1, 4, 3)),
    img_size=(256, 256),
    out_channels=21,
    head='heatmap',
    deconv_filters=(),
    deconv_kernels=(),
    head_extra_convs=(1,),
    final_kernel=1,
    flip_test=True,
    post_process='default',
    use_udp=False,
    shift_heatmap=True,
    modulate_kernel=11,
)
runtime = dict(work_dir='work_dirs/hrnetv2_w18_rhd2d_256x256')

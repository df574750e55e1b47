# HRNetV2-W18 on FreiHAND (21 kpts; reference:
# configs/hand/2d_kpt_sview_rgb_img/topdown_heatmap/freihand2d/hrnetv2_w18_freihand2d_256x256.py)
_base_ = ['../hand/res50_freihand2d_224x224.py']

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
data = dict(image_size=(256, 256), heatmap_size=(64, 64))
runtime = dict(work_dir='work_dirs/hrnetv2_w18_freihand2d_256x256')

# res50_panoptic2d_256x256: SimpleBaseline ResNet-50 recipe (reference: configs/hand/2d_kpt_sview_rgb_img/topdown_heatmap/panoptic2d/res50_panoptic2d_256x256.py)
_base_ = ['../hand/hrnetv2_w18_panoptic2d_256x256.py']

model = dict(
    _delete_=True,
    backbone_type='resnet',
    backbone_overrides=dict(depth=50),
    img_size=(256, 256),
    out_channels=21,
    head='heatmap',
    deconv_filters=(256, 256, 256),
    deconv_kernels=(4, 4, 4),
    flip_test=True,
    post_process='default',
    use_udp=False,
    shift_heatmap=True,
    modulate_kernel=11,
)
runtime = dict(work_dir='work_dirs/res50_panoptic2d_256x256')

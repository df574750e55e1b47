# res50_ap10k_256x256 (reference: configs/animal/2d_kpt_sview_rgb_img/topdown_heatmap/ap10k/res50_ap10k_256x256.py)
_base_ = ['../ap10k/vitpose_b_ap10k_256x192.py']

model = dict(
    _delete_=True,
    backbone_type='resnet',
    backbone_overrides=dict(depth=50),
    img_size=(256, 256),
    out_channels=17,
    head='heatmap',
    deconv_filters=(256, 256, 256),
    deconv_kernels=(4, 4, 4),
    flip_test=True,
    post_process='default',
    use_udp=False,
    shift_heatmap=True,
)
data = dict(image_size=(256, 256), heatmap_size=(64, 64))
target = dict(encoding='MSRA', sigma=2.0)
runtime = dict(work_dir='work_dirs/res50_ap10k_256x256')

# hrnet_w48_ap10k_256x256 (reference: configs/animal/2d_kpt_sview_rgb_img/topdown_heatmap/ap10k/hrnet_w48_ap10k_256x256.py)
_base_ = ['../ap10k/vitpose_b_ap10k_256x192.py']

model = dict(
    _delete_=True,
    backbone_type='hrnet',
    backbone_overrides=dict(width=48, stage_modules=(1, 4, 3),
                            dtype='bfloat16'),
    img_size=(256, 256),
    out_channels=17,
    head='heatmap',
    deconv_filters=(),
    dtype='bfloat16',
    flip_test=True,
    post_process='default',
    use_udp=False,
    shift_heatmap=True,
)
data = dict(image_size=(256, 256), heatmap_size=(64, 64))
target = dict(encoding='MSRA', sigma=2.0)
runtime = dict(work_dir='work_dirs/hrnet_w48_ap10k_256x256')

# litehrnet_w18_coco_wholebody_hand_256x256 (reference: configs/hand/2d_kpt_sview_rgb_img/topdown_heatmap/coco_wholebody_hand/litehrnet_w18_coco_wholebody_hand_256x256.py)
_base_ = ['../hand/hrnetv2_w18_coco_wholebody_hand_256x256.py']

model = dict(
    _delete_=True,
    backbone_type='litehrnet',
    backbone_overrides=dict(num_modules=(2, 4, 2)),
    img_size=(256, 256),
    out_channels=21,
    head='heatmap',
    deconv_filters=(),
    flip_test=True,
    post_process='default',
    use_udp=False,
    shift_heatmap=True,
    modulate_kernel=11,
)
runtime = dict(work_dir='work_dirs/litehrnet_w18_coco_wholebody_hand_256x256')

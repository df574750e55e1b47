# mobilenetv2_coco_wholebody_face_256x256 (reference: configs/face/2d_kpt_sview_rgb_img/topdown_heatmap/coco_wholebody_face/mobilenetv2_coco_wholebody_face_256x256.py)
_base_ = ['../face/hrnetv2_w18_coco_wholebody_face_256x256.py']

model = dict(
    _delete_=True,
    backbone_type='mobilenet_v2',
    backbone_overrides=dict(dtype='bfloat16', widen_factor=1.0),
    img_size=(256, 256),
    out_channels=68,
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
runtime = dict(work_dir='work_dirs/mobilenetv2_coco_wholebody_face_256x256')

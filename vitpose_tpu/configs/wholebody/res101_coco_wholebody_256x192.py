# res101_coco_wholebody_256x192 (reference: configs/wholebody/2d_kpt_sview_rgb_img/topdown_heatmap/coco-wholebody/res101_coco_wholebody_256x192.py)
_base_ = ['../wholebody/vitpose_b_wholebody_256x192.py']

model = dict(
    _delete_=True,
    backbone_type='resnet',
    backbone_overrides=dict(depth=101),
    img_size=(256, 192),
    out_channels=133,
    head='heatmap',
    deconv_filters=(256, 256, 256),
    deconv_kernels=(4, 4, 4),
    dtype='bfloat16',
    flip_test=True,
    post_process='default',
    use_udp=False,
    shift_heatmap=True,
)
data = dict(image_size=(192, 256), heatmap_size=(48, 64))
target = dict(encoding='MSRA', sigma=2.0)
runtime = dict(work_dir='work_dirs/res101_coco_wholebody_256x192')

# resnest200 top-down COCO at 384x288 (reference:
# configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/coco/resnest200_coco_384x288.py)
_base_ = ['../base/default_runtime.py', '../base/coco_data.py']

model = dict(
    backbone_type='resnest',
    backbone_overrides=dict(depth=200),
    img_size=(384, 288),
    out_channels=17,
    head='heatmap',
    deconv_filters=(256, 256, 256),
    deconv_kernels=(4, 4, 4),
    dtype='bfloat16',
    flip_test=True,
    post_process='default',
    use_udp=False,
    shift_heatmap=True,
)
data = dict(image_size=(288, 384), heatmap_size=(72, 96))
# biased-MSRA targets (the reference recipe; the inherited coco_data
# default is UDP, which must not leak into non-UDP models)
target = dict(encoding='MSRA', sigma=3.0)
optimizer = dict(base_lr=5e-4, warmup_iters=500, decay_epochs=(170, 200),
                 total_epochs=210)
runtime = dict(work_dir='work_dirs/resnest200_coco_384x288')

# HRFormer-Base top-down COCO at 256x192 (reference:
# configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/coco/hrformer_base_coco_256x192.py)
_base_ = ['../base/default_runtime.py', '../base/coco_data.py']

model = dict(
    backbone_type='hrformer',
    backbone_overrides=dict(width=78, stage_modules=(1, 4, 2),
                            num_heads=(2, 4, 8, 16)),
    img_size=(256, 192),
    out_channels=17,
    head='heatmap',
    deconv_filters=(),
    flip_test=True,
    post_process='default',
    use_udp=False,
    shift_heatmap=True,
)
data = dict(image_size=(192, 256), heatmap_size=(48, 64))
# biased-MSRA targets (the reference recipe; the inherited coco_data
# default is UDP, which must not leak into non-UDP models)
target = dict(encoding='MSRA', sigma=2.0)
optimizer = dict(base_lr=1e-3, weight_decay=0.01, warmup_iters=500,
                 decay_epochs=(170, 200), total_epochs=210)
runtime = dict(work_dir='work_dirs/hrformer_base_coco_256x192')

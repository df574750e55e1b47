# HRFormer-S top-down COCO (reference:
# configs/.../topdown_heatmap/coco/hrformer_small_coco_256x192.py)
_base_ = ['../base/default_runtime.py', '../base/coco_data.py']

model = dict(
    backbone_type='hrformer',
    backbone_overrides=dict(width=32, stage_modules=(1, 2, 2),
                            num_heads=(1, 2, 4, 8)),
    img_size=(256, 192),
    out_channels=17,
    head='heatmap',
    deconv_filters=(),
    flip_test=True,
    post_process='default',
    use_udp=False,
    shift_heatmap=True,
)
# biased-MSRA targets (the reference recipe; the inherited coco_data
# default is UDP, which must not leak into non-UDP models)
target = dict(encoding='MSRA', sigma=2.0)
optimizer = dict(base_lr=1e-3, weight_decay=0.01, warmup_iters=500,
                 decay_epochs=(170, 200), total_epochs=210)
runtime = dict(work_dir='work_dirs/hrformer_small_coco_256x192')

# Lite-HRNet-18 top-down COCO (reference:
# configs/.../topdown_heatmap/coco/litehrnet_18_coco_256x192.py)
_base_ = ['../base/default_runtime.py', '../base/coco_data.py']

model = dict(
    backbone_type='litehrnet',
    backbone_overrides=dict(num_modules=(2, 4, 2)),
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
optimizer = dict(base_lr=2e-3, warmup_iters=500, decay_epochs=(170, 200),
                 total_epochs=210)
runtime = dict(work_dir='work_dirs/litehrnet_18_coco_256x192')

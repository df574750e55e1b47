# MobileNetV2 top-down COCO (reference:
# configs/.../topdown_heatmap/coco/mobilenetv2_coco_256x192.py):
# SimpleBaseline 3-deconv head on the 1280-ch feature map.
_base_ = ['../base/default_runtime.py', '../base/coco_data.py']

model = dict(
    backbone_type='mobilenet_v2',
    backbone_overrides=dict(dtype='bfloat16', widen_factor=1.0),
    img_size=(256, 192),
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
target = dict(encoding='MSRA', sigma=2.0)
optimizer = dict(base_lr=5e-4, warmup_iters=500, decay_epochs=(170, 200),
                 total_epochs=210)
runtime = dict(work_dir='work_dirs/mobilenetv2_coco_256x192')

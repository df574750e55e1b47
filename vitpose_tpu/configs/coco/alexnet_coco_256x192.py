# AlexNet top-down COCO (reference:
# configs/.../topdown_heatmap/coco/alexnet_coco_256x192.py; the stride-4
# stem yields a 40x56 heatmap at 192x256 input).
_base_ = ['../base/default_runtime.py', '../base/coco_data.py']

model = dict(
    backbone_type='alexnet',
    backbone_overrides=dict(dtype='bfloat16', ),
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
data = dict(heatmap_size=(40, 56))
target = dict(encoding='MSRA', sigma=2.0)
optimizer = dict(base_lr=5e-4, warmup_iters=500, decay_epochs=(170, 200),
                 total_epochs=210)
runtime = dict(work_dir='work_dirs/alexnet_coco_256x192')

# Hourglass-52 top-down COCO (reference:
# configs/.../topdown_heatmap/coco/hourglass52_coco_256x256.py):
# single-stack hourglass + bare 1x1 multi-stage prediction head.
_base_ = ['../base/default_runtime.py', '../base/coco_data.py']

model = dict(
    backbone_type='hourglass',
    backbone_overrides=dict(dtype='bfloat16', num_stacks=1),
    img_size=(256, 256),
    out_channels=17,
    head='multistage',
    num_stages=1,
    deconv_filters=(),
    final_kernel=1,
    dtype='bfloat16',
    flip_test=True,
    post_process='default',
    use_udp=False,
    shift_heatmap=True,
)
data = dict(image_size=(256, 256), heatmap_size=(64, 64))
target = dict(encoding='MSRA', sigma=2.0)
optimizer = dict(base_lr=5e-4, warmup_iters=500, decay_epochs=(170, 200),
                 total_epochs=210)
runtime = dict(work_dir='work_dirs/hourglass52_coco_256x256')

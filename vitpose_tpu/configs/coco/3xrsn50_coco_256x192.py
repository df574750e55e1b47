# 3xRSN-50 top-down COCO (reference:
# configs/.../topdown_heatmap/coco/3xrsn50_coco_256x192.py): three
# stacked RSN-50 stages with the MSMU PredictHeatmap head.
_base_ = ['../base/default_runtime.py', '../base/coco_data.py']

model = dict(
    backbone_type='rsn',
    backbone_overrides=dict(dtype='bfloat16', num_stages=3, num_units=4,
                            num_blocks=(3, 4, 6, 3), unit_channels=256,
                            num_steps=4, expand_times=26),
    img_size=(256, 192),
    out_channels=17,
    head='msmu',
    num_stages=3,
    num_units=4,
    dtype='bfloat16',
    flip_test=True,
    post_process='megvii',
    modulate_kernel=5,
    use_udp=False,
    shift_heatmap=False,
)
target = dict(encoding='MSRA', sigma=2.0)
optimizer = dict(base_lr=5e-3, warmup_iters=500, decay_epochs=(170, 200),
                 total_epochs=210)
runtime = dict(work_dir='work_dirs/3xrsn50_coco_256x192')

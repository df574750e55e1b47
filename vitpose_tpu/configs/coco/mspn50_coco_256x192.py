# MSPN-50 (single stage, 4 units) top-down COCO (reference:
# configs/.../topdown_heatmap/coco/mspn50_coco_256x192.py). All
# stage-units are supervised through the MSMU head; units below heatmap
# resolution train against a resized target.
_base_ = ['../base/default_runtime.py', '../base/coco_data.py']

model = dict(
    backbone_type='mspn',
    backbone_overrides=dict(dtype='bfloat16', num_stages=1, num_units=4,
                            num_blocks=(3, 4, 6, 3), unit_channels=256),
    img_size=(256, 192),
    out_channels=17,
    head='msmu',
    num_stages=1,
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
runtime = dict(work_dir='work_dirs/mspn50_coco_256x192')

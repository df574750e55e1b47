# ViTPose-S classic decoder, COCO 256x192 (reference:
# configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/coco/ViTPose_s*_coco_256x192.py)
_base_ = ['../base/default_runtime.py', '../base/coco_data.py']

model = dict(
    variant='s',
    img_size=(256, 192),
    out_channels=17,
    head='heatmap',
    dtype='bfloat16',
    remat=False,
    flip_test=True,
    post_process='default',
    use_udp=True,
)
optimizer = dict(
    base_lr=5e-4,
    weight_decay=0.1,
    layer_decay_rate=0.8,
    warmup_iters=500,
    warmup_ratio=1e-3,
    decay_epochs=(170, 200),
    total_epochs=210,
    grad_clip_norm=1.0,
)
runtime = dict(work_dir='work_dirs/vitpose_s_coco_256x192')

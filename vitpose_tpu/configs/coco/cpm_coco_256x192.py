# CPM (Convolutional Pose Machines) top-down COCO (reference:
# configs/.../topdown_heatmap/coco/cpm_coco_256x192.py). The backbone
# emits per-stage heatmaps; head='identity' matches the reference's
# final_conv_kernel=0 MultiStage head.
_base_ = ['../base/default_runtime.py', '../base/coco_data.py']

model = dict(
    backbone_type='cpm',
    backbone_overrides=dict(dtype='bfloat16', out_channels=17, num_stages=6,
                            feat_channels=128),
    img_size=(256, 192),
    out_channels=17,
    head='identity',
    num_stages=6,
    dtype='bfloat16',
    flip_test=True,
    post_process='default',
    use_udp=False,
    shift_heatmap=True,
)
data = dict(heatmap_size=(24, 32))
target = dict(encoding='MSRA', sigma=2.0)
optimizer = dict(base_lr=5e-4, warmup_iters=500, decay_epochs=(170, 200),
                 total_epochs=210)
runtime = dict(work_dir='work_dirs/cpm_coco_256x192')

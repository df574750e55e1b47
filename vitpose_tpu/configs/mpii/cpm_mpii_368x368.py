# CPM on MPII at 368x368 (reference: configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/mpii/cpm_mpii_368x368.py)
_base_ = ['../base/default_runtime.py', '../base/mpii_data.py']

model = dict(
    backbone_type='cpm',
    backbone_overrides=dict(dtype='bfloat16', out_channels=16, num_stages=6,
                            feat_channels=128),
    img_size=(368, 368),
    out_channels=16,
    head='identity',
    num_stages=6,
    dtype='bfloat16',
    flip_test=True,
    post_process='default',
    use_udp=False,
    shift_heatmap=True,
)
data = dict(image_size=(368, 368), heatmap_size=(46, 46))
optimizer = dict(base_lr=5e-4, warmup_iters=500, decay_epochs=(170, 200),
                 total_epochs=210)
runtime = dict(work_dir='work_dirs/cpm_mpii_368x368')

# litehrnet_30_mpii_256x256 (reference: configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/mpii/litehrnet_30_mpii_256x256.py)
_base_ = ['../base/default_runtime.py', '../base/mpii_data.py']

model = dict(
    backbone_type='litehrnet',
    backbone_overrides=dict(num_modules=(3, 8, 3)),
    img_size=(256, 256),
    out_channels=16,
    head='heatmap',
    deconv_filters=(),
    flip_test=True,
    post_process='default',
    use_udp=False,
    shift_heatmap=True,
)
optimizer = dict(base_lr=2e-3, warmup_iters=500, decay_epochs=(170, 200),
                 total_epochs=210)
runtime = dict(work_dir='work_dirs/litehrnet_30_mpii_256x256')

# hrnet_w48_horse10_256x256-split1 (reference: configs/animal/2d_kpt_sview_rgb_img/topdown_heatmap/horse10/hrnet_w48_horse10_256x256-split1.py)
_base_ = ['../animal/res50_horse10_256x256.py']

model = dict(
    _delete_=True,
    backbone_type='hrnet',
    backbone_overrides=dict(width=48, stage_modules=(1, 4, 3),
                            dtype='bfloat16'),
    img_size=(256, 256),
    out_channels=22,
    head='heatmap',
    deconv_filters=(),
    dtype='bfloat16',
    flip_test=True,
    post_process='default',
    use_udp=False,
    shift_heatmap=True,
)
runtime = dict(work_dir='work_dirs/hrnet_w48_horse10_256x256-split1')

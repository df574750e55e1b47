# ViPNAS-MobileNetV3 + ViPNAS grouped-deconv head, COCO (reference:
# configs/.../topdown_heatmap/coco/vipnas_mbv3_coco_256x192.py)
_base_ = ['../base/default_runtime.py', '../base/coco_data.py']

model = dict(
    backbone_type='vipnas_mbv3',
    img_size=(256, 192),
    out_channels=17,
    head='vipnas',
    # reference vipnas_mbv3 head: depthwise grouped deconvs
    deconv_filters=(160, 160, 160),
    deconv_groups=(160, 160, 160),
    flip_test=True,
    post_process='default',
    use_udp=False,
    shift_heatmap=True,
)
# biased-MSRA targets (the reference recipe; the inherited coco_data
# default is UDP, which must not leak into non-UDP models)
target = dict(encoding='MSRA', sigma=2.0)
optimizer = dict(base_lr=5e-4, warmup_iters=500, decay_epochs=(170, 200),
                 total_epochs=210)
runtime = dict(work_dir='work_dirs/vipnas_mbv3_coco_256x192')

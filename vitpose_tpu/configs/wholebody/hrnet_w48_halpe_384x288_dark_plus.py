# HRNet-W48 + DARK on Halpe full-body at 384x288 ("dark+": the
# released AlphaPose recipe) (reference: configs/wholebody/
# 2d_kpt_sview_rgb_img/topdown_heatmap/halpe/
# hrnet_w48_halpe_384x288_dark_plus.py)
_base_ = ['hrnet_w32_halpe_256x192.py']
model = dict(backbone_overrides=dict(width=48, stage_modules=(1, 4, 3)),
             img_size=(384, 288), post_process='unbiased')
data = dict(image_size=(288, 384), heatmap_size=(72, 96))
target = dict(encoding='MSRA', sigma=3.0, unbiased=True)
runtime = dict(work_dir='work_dirs/hrnet_w48_halpe_384x288_dark_plus')

# res101_fly_192x192 (reference: configs/animal/2d_kpt_sview_rgb_img/topdown_heatmap/fly/res101_fly_192x192.py)
_base_ = ['../animal/res152_fly_192x192.py']

model = dict(backbone_overrides=dict(depth=101))
runtime = dict(work_dir='work_dirs/res101_fly_192x192')

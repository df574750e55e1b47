# res152_macaque_256x192 (reference: configs/animal/2d_kpt_sview_rgb_img/topdown_heatmap/macaque/res152_macaque_256x192.py)
_base_ = ['../animal/res50_macaque_256x192.py']

model = dict(backbone_overrides=dict(depth=152))
runtime = dict(work_dir='work_dirs/res152_macaque_256x192')

# res152_atrw_256x256 (reference: configs/animal/2d_kpt_sview_rgb_img/topdown_heatmap/atrw/res152_atrw_256x256.py)
_base_ = ['../animal/res50_atrw_256x256.py']

model = dict(backbone_overrides=dict(depth=152))
runtime = dict(work_dir='work_dirs/res152_atrw_256x256')

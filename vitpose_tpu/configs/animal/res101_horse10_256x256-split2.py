# res101_horse10_256x256-split2 (reference: configs/animal/2d_kpt_sview_rgb_img/topdown_heatmap/horse10/res101_horse10_256x256-split2.py)
_base_ = ['../animal/res50_horse10_256x256-split2.py']

model = dict(backbone_overrides=dict(depth=101))
runtime = dict(work_dir='work_dirs/res101_horse10_256x256-split2')

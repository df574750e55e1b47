# res101_zebra_160x160 (reference: configs/animal/2d_kpt_sview_rgb_img/topdown_heatmap/zebra/res101_zebra_160x160.py)
_base_ = ['../animal/res152_zebra_160x160.py']

model = dict(backbone_overrides=dict(depth=101))
runtime = dict(work_dir='work_dirs/res101_zebra_160x160')

# res101_deepfashion_full_256x192 (reference: configs/fashion/2d_kpt_sview_rgb_img/topdown_heatmap/deepfashion/res101_deepfashion_full_256x192.py)
_base_ = ['../fashion/res50_deepfashion_full_256x192.py']

model = dict(backbone_overrides=dict(depth=101))
runtime = dict(work_dir='work_dirs/res101_deepfashion_full_256x192')

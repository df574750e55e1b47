# res152_deepfashion_lower_256x192 (reference: configs/fashion/2d_kpt_sview_rgb_img/topdown_heatmap/deepfashion/res152_deepfashion_lower_256x192.py)
_base_ = ['../fashion/res50_deepfashion_lower_256x192.py']

model = dict(backbone_overrides=dict(depth=152))
runtime = dict(work_dir='work_dirs/res152_deepfashion_lower_256x192')

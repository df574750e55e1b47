# res152_horse10_256x256-split1 (reference: configs/animal/2d_kpt_sview_rgb_img/topdown_heatmap/horse10/res152_horse10_256x256-split1.py)
_base_ = ['../animal/res50_horse10_256x256.py']

model = dict(backbone_overrides=dict(depth=152))
runtime = dict(work_dir='work_dirs/res152_horse10_256x256-split1')

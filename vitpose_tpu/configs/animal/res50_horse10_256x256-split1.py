# SimpleBaseline ResNet-50 on Horse-10, split 1 (reference:
# configs/animal/2d_kpt_sview_rgb_img/topdown_heatmap/horse10/
# res50_horse10_256x256-split1.py)
_base_ = ['res50_horse10_256x256.py']
runtime = dict(work_dir='work_dirs/res50_horse10_256x256-split1')

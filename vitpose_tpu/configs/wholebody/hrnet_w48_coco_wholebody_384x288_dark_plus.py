# HRNet-W48 + DARK on COCO-WholeBody, "plus" recipe: full-model init from
# the COCO body DARK checkpoint instead of ImageNet backbone pretraining
# (reference: configs/wholebody/2d_kpt_sview_rgb_img/topdown_heatmap/
# coco-wholebody/hrnet_w48_coco_wholebody_384x288_dark_plus.py)
import os as _os
_W = _os.environ.get('PRETRAIN_ROOT', 'models/pretrained')
_base_ = ['hrnet_w48_coco_wholebody_384x288_dark.py']
load_from = f'{_W}/hrnet_w48_coco_384x288_dark-741844ba_20200812.pth'
runtime = dict(work_dir='work_dirs/hrnet_w48_coco_wholebody_384x288_dark_plus')

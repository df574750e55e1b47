# res50_horse10_256x256-split3 (reference: configs/animal/2d_kpt_sview_rgb_img/topdown_heatmap/horse10/res50_horse10_256x256-split3.py)
import os as _os
_ROOT = _os.environ.get('HORSE10_ROOT', '/data/horse10')
_base_ = ['../animal/res50_horse10_256x256.py']

data = dict(
    train=dict(ann_file=f'{_ROOT}/annotations/'
                        'horse10-train-split3.json',
               img_prefix=f'{_ROOT}/'),
    val=dict(ann_file=f'{_ROOT}/annotations/horse10-test-split3.json',
             img_prefix=f'{_ROOT}/', use_gt_bbox=True))
runtime = dict(work_dir='work_dirs/res50_horse10_256x256-split3')

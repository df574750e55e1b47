# ViTPose-L evaluated on OCHuman (COCO 17 kpts, GT boxes; train on COCO)
# (reference: configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/ochuman/
#  ViTPose_large_ochuman_256x192.py)
import os as _os
_ROOT = _os.environ.get('OCHUMAN_ROOT', '/data/ochuman')
_base_ = ['../coco/vitpose_l_coco_256x192.py']
data = dict(val=dict(
    ann_file=f'{_ROOT}/annotations/'
             'ochuman_coco_format_val_range_0.00_1.00.json',
    img_prefix=f'{_ROOT}/images/', use_gt_bbox=True, bbox_file=None,
    _delete_=True))
runtime = dict(work_dir='work_dirs/vitpose_l_ochuman')

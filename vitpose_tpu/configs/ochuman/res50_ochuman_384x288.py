# res50_ochuman_384x288: the COCO recipe evaluated on OCHuman GT boxes (reference:
# configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/ochuman/res50_ochuman_384x288.py)
import os as _os
_ROOT = _os.environ.get('OCHUMAN_ROOT', '/data/ochuman')
_base_ = ['../coco/res50_coco_384x288.py']

data = dict(dataset='ochuman',
            val=dict(ann_file=f'{_ROOT}/annotations/'
                              'ochuman_coco_format_val_range_0.00_1.00.json',
                     img_prefix=f'{_ROOT}/images/', use_gt_bbox=True,
                     bbox_file=None, _delete_=True))
runtime = dict(work_dir='work_dirs/res50_ochuman_384x288')

# res50_jhmdb_sub3_256x256 (reference: configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/jhmdb/res50_jhmdb_sub3_256x256.py)
import os as _os
_ROOT = _os.environ.get('JHMDB_ROOT', '/data/jhmdb')
_base_ = ['../jhmdb/res50_jhmdb_sub1_256x256.py']

data = dict(
    train=dict(ann_file=f'{_ROOT}/annotations/Sub3_train.json',
               img_prefix=f'{_ROOT}/'),
    val=dict(ann_file=f'{_ROOT}/annotations/Sub3_test.json',
             img_prefix=f'{_ROOT}/', use_gt_bbox=True))
runtime = dict(work_dir='work_dirs/res50_jhmdb_sub3_256x256')

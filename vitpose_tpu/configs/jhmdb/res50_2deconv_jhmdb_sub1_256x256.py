# res50_2deconv_jhmdb_sub1_256x256: 2-deconv head at heatmap stride 8 (reference:
# configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/jhmdb/res50_2deconv_jhmdb_sub1_256x256.py)
import os as _os
_ROOT = _os.environ.get('JHMDB_ROOT', '/data/jhmdb')
_base_ = ['../jhmdb/res50_jhmdb_sub1_256x256.py']

model = dict(deconv_filters=(256, 256), deconv_kernels=(4, 4))
data = dict(
    heatmap_size=(32, 32),
    train=dict(ann_file=f'{_ROOT}/annotations/Sub1_train.json',
               img_prefix=f'{_ROOT}/'),
    val=dict(ann_file=f'{_ROOT}/annotations/Sub1_test.json',
             img_prefix=f'{_ROOT}/', use_gt_bbox=True))
runtime = dict(work_dir='work_dirs/res50_2deconv_jhmdb_sub1_256x256')

# cpm_jhmdb_sub3_368x368 (reference: configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/jhmdb/cpm_jhmdb_sub3_368x368.py)
import os as _os
_ROOT = _os.environ.get('JHMDB_ROOT', '/data/jhmdb')
_base_ = ['../jhmdb/res50_jhmdb_sub1_256x256.py']

model = dict(
    backbone_type='cpm',
    backbone_overrides=dict(dtype='bfloat16', out_channels=15, num_stages=6,
                            feat_channels=128),
    img_size=(368, 368),
    head='identity',
    num_stages=6,
    deconv_filters=(),
    dtype='bfloat16',
    _delete_=True,
    out_channels=15,
    flip_test=True,
    post_process='default',
    use_udp=False,
    shift_heatmap=True,
)
data = dict(
    image_size=(368, 368), heatmap_size=(46, 46),
    train=dict(ann_file=f'{_ROOT}/annotations/Sub3_train.json',
               img_prefix=f'{_ROOT}/'),
    val=dict(ann_file=f'{_ROOT}/annotations/Sub3_test.json',
             img_prefix=f'{_ROOT}/', use_gt_bbox=True))
runtime = dict(work_dir='work_dirs/cpm_jhmdb_sub3_368x368')

# MPII top-down data defaults (16 joints, PCKh eval; reference
# configs/_base_/datasets/mpii.py conventions). MPII_ROOT points at data.
import os as _os
_MPII_ROOT = _os.environ.get('MPII_ROOT', '/data/mpii')

data = dict(
    dataset='mpii',
    image_size=(256, 256), heatmap_size=(64, 64),
    batch_size=64, canvas_size=1440, num_workers=8,
    train=dict(ann_file=f'{_MPII_ROOT}/annotations/mpii_train.json',
               img_prefix=f'{_MPII_ROOT}/images/'),
    val=dict(ann_file=f'{_MPII_ROOT}/annotations/mpii_val.json',
             img_prefix=f'{_MPII_ROOT}/images/', use_gt_bbox=True),
    aug=dict(flip_prob=0.5, half_body_prob=0.0, scale_factor=0.25,
             rot_factor=30.0, rot_prob=0.6),
)
target = dict(encoding='MSRA', sigma=2.0)
runtime = dict(save_best='PCKh')

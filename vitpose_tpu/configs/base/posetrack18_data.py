# PoseTrack18 top-down (frame-level) data defaults (17 joints, poseval mAP).
import os as _os
_PT_ROOT = _os.environ.get('POSETRACK_ROOT', '/data/posetrack18')

data = dict(
    dataset='posetrack18',
    image_size=(192, 256), heatmap_size=(48, 64),
    batch_size=64, canvas_size=1280, num_workers=8,
    train=dict(ann_file=f'{_PT_ROOT}/annotations/'
                        'posetrack18_train.json',
               img_prefix=f'{_PT_ROOT}/'),
    val=dict(ann_file=f'{_PT_ROOT}/annotations/posetrack18_val.json',
             img_prefix=f'{_PT_ROOT}/', use_gt_bbox=True),
    aug=dict(flip_prob=0.5, half_body_prob=0.3, scale_factor=0.5,
             rot_factor=40.0, rot_prob=0.6),
)
target = dict(encoding='MSRA', sigma=2.0)

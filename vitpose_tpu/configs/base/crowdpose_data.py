# CrowdPose top-down data defaults (14 joints, crowd-protocol AP).
import os as _os
_CP_ROOT = _os.environ.get('CROWDPOSE_ROOT', '/data/crowdpose')

data = dict(
    dataset='crowdpose',
    image_size=(192, 256), heatmap_size=(48, 64),
    batch_size=64, canvas_size=640, num_workers=8,
    train=dict(ann_file=f'{_CP_ROOT}/annotations/'
                        'mmpose_crowdpose_trainval.json',
               img_prefix=f'{_CP_ROOT}/images/'),
    val=dict(ann_file=f'{_CP_ROOT}/annotations/'
                      'mmpose_crowdpose_test.json',
             img_prefix=f'{_CP_ROOT}/images/', use_gt_bbox=False,
             bbox_file=f'{_CP_ROOT}/annotations/det_for_crowd_test'
                       '_0.1_0.5.json'),
    aug=dict(flip_prob=0.5, half_body_prob=0.3, scale_factor=0.5,
             rot_factor=40.0, rot_prob=0.6),
)
target = dict(encoding='MSRA', sigma=2.0)

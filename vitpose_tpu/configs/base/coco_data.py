# COCO top-down data defaults. Point COCO_ROOT at your data.
import os as _os
_COCO_ROOT = _os.environ.get('COCO_ROOT', '/data/coco')

data = dict(
    dataset='coco',
    image_size=(192, 256),
    heatmap_size=(48, 64),
    batch_size=64,
    canvas_size=640,
    num_workers=16,
    train=dict(
        ann_file=f'{_COCO_ROOT}/annotations/person_keypoints_train2017.json',
        img_prefix=f'{_COCO_ROOT}/train2017/',
        use_gt_bbox=True,
    ),
    val=dict(
        ann_file=f'{_COCO_ROOT}/annotations/person_keypoints_val2017.json',
        img_prefix=f'{_COCO_ROOT}/val2017/',
        use_gt_bbox=False,
        bbox_file=f'{_COCO_ROOT}/detections/'
                  'COCO_val2017_detections_AP_H_56_person.json',
    ),
    aug=dict(flip_prob=0.5, half_body_prob=0.3, scale_factor=0.5,
             rot_factor=40.0, rot_prob=0.6),
)
target = dict(encoding='UDP', sigma=2.0)

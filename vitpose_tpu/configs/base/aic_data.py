# AIC top-down data defaults (14 joints; reference aic.py conventions).
import os as _os
_AIC_ROOT = _os.environ.get('AIC_ROOT', '/data/aic')

data = dict(
    dataset='aic',
    image_size=(192, 256), heatmap_size=(48, 64),
    batch_size=64, canvas_size=640, num_workers=8,
    train=dict(ann_file=f'{_AIC_ROOT}/annotations/aic_train.json',
               img_prefix=f'{_AIC_ROOT}/ai_challenger_keypoint'
                          '_train_20170902/keypoint_train_images'
                          '_20170902/'),
    val=dict(ann_file=f'{_AIC_ROOT}/annotations/aic_val.json',
             img_prefix=f'{_AIC_ROOT}/ai_challenger_keypoint'
                        '_validation_20170911/keypoint_validation'
                        '_images_20170911/',
             use_gt_bbox=True),
    aug=dict(flip_prob=0.5, half_body_prob=0.3, scale_factor=0.5,
             rot_factor=40.0, rot_prob=0.6),
)
target = dict(encoding='MSRA', sigma=2.0)

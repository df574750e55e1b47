# ViTPose_small_combo_finetune_3kTOP_amass_rotated_256x192: fork probe config rebuilt 1:1 (reference:
# configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/coco/ViTPose_small_combo_finetune_3kTOP_amass_rotated_256x192.py)
import os as _os
_DATA = _os.environ.get('VITPOSE_DATA_ROOT', '/data')
_base_ = ['../base/default_runtime.py']
model = dict(
    variant='s', img_size=(256, 192), out_channels=17,
    head='heatmap', dtype='bfloat16', flip_test=True,
    post_process='default', use_udp=True, shift_heatmap=False,
    backbone_overrides=dict(fused_attention=True),
)
data = dict(
    dataset='coco', image_size=(192, 256), heatmap_size=(48, 64),
    batch_size=128, canvas_size=640, num_workers=8, padding=1.25,
    train=dict(ann_file=f'{_DATA}/SyntheticPose/ViTPose_finetune_AMASS_3k_TOP_with_COCO' + '/annotations/'
                        'person_keypoints_train2017.json',
               img_prefix=f'{_DATA}/SyntheticPose/ViTPose_finetune_AMASS_3k_TOP_with_COCO' + '/train2017/',
               use_gt_bbox=True),
    val=dict(ann_file=f'{_DATA}/SyntheticPose/TOP_val' + '/annotations/'
                      'person_keypoints_val2017.json',
             img_prefix=f'{_DATA}/SyntheticPose/TOP_val' + '/val2017/', use_gt_bbox=True),
    aug=dict(flip_prob=0.5, half_body_prob=0.3, scale_factor=0.5,
             rot_factor=120.0, rot_prob=0.6),
)
target = dict(encoding='UDP', sigma=2.0)
load_from = 'models/pretrained/vitpose-s.pth'
evaluation = dict(interval=1, metric='mAP', save_best='AP')
optimizer = dict(base_lr=5e-5, weight_decay=0.1,
                 layer_decay_rate=0.8, warmup_iters=300,
                 decay_epochs=(350, 900), total_epochs=1000,
                 grad_clip_norm=1.0)
runtime = dict(work_dir='work_dirs/vitpose_s_combo_finetune_3ktop_amass_rotated_256x192')

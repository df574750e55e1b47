# ViTPose_base_simple_COMBO_finetune_256x192: fork probe config rebuilt 1:1 (reference:
# configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/coco/ViTPose_base_simple_COMBO_finetune_256x192.py)
import os as _os
_DATA = _os.environ.get('VITPOSE_DATA_ROOT', '/data')
_base_ = ['../base/default_runtime.py']
model = dict(
    variant='b', img_size=(256, 192), out_channels=17,
    head='simple', upsample=4, dtype='bfloat16', flip_test=True,
    post_process='default', use_udp=True, shift_heatmap=False,
    backbone_overrides=dict(fused_attention=True),
)
data = dict(
    dataset='coco', image_size=(192, 256), heatmap_size=(48, 64),
    batch_size=32, canvas_size=640, num_workers=8, padding=1.25,
    train=dict(ann_file=f'{_DATA}/SyntheticPose/TOP_textured_and_COCO' + '/annotations/'
                        'person_keypoints_train2017.json',
               img_prefix=f'{_DATA}/SyntheticPose/TOP_textured_and_COCO' + '/train2017/',
               use_gt_bbox=True),
    val=dict(ann_file=f'{_DATA}/COCO/original' + '/annotations/'
                      'person_keypoints_val2017.json',
             img_prefix=f'{_DATA}/COCO/original' + '/val2017/', use_gt_bbox=True),
    aug=dict(flip_prob=0.5, half_body_prob=0.3, scale_factor=0.5,
             rot_factor=40.0, rot_prob=0.6),
)
target = dict(encoding='UDP', sigma=2.0)
load_from = 'models/pretrained/vitpose-b-simple.pth'
evaluation = dict(interval=1, metric='mAP', save_best='AP')
optimizer = dict(base_lr=5e-6, weight_decay=0.1,
                 layer_decay_rate=0.75, warmup_iters=10,
                 decay_epochs=(170, 200), total_epochs=210,
                 grad_clip_norm=1.0)
runtime = dict(work_dir='work_dirs/vitpose_b_simple_combo_finetune_256x192')

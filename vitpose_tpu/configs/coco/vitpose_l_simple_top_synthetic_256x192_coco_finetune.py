# ViTPose_large_simple_TOP_synthetic_256x192_COCO_finetune: fork probe config rebuilt 1:1 (reference:
# configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/coco/ViTPose_large_simple_TOP_synthetic_256x192_COCO_finetune.py)
import os as _os
_DATA = _os.environ.get('VITPOSE_DATA_ROOT', '/data')
_base_ = ['../base/default_runtime.py']
model = dict(
    variant='l', img_size=(256, 192), out_channels=17,
    head='simple', upsample=4, dtype='bfloat16', flip_test=True,
    post_process='default', use_udp=True, shift_heatmap=False,
    backbone_overrides=dict(fused_attention=True),
)
data = dict(
    dataset='coco', image_size=(192, 256), heatmap_size=(48, 64),
    batch_size=8, canvas_size=640, num_workers=8, padding=1.25,
    train=dict(ann_file=f'{_DATA}/SyntheticPose/TOP_synthetic' + '/annotations/'
                        'person_keypoints_train2017.json',
               img_prefix=f'{_DATA}/SyntheticPose/TOP_synthetic' + '/train2017/',
               use_gt_bbox=True),
    val=dict(ann_file=f'{_DATA}/COCO/humans_only/all' + '/annotations/'
                      'person_keypoints_val2017.json',
             img_prefix=f'{_DATA}/COCO/humans_only/all' + '/val2017/', use_gt_bbox=True),
    aug=dict(flip_prob=0.5, half_body_prob=0.3, scale_factor=0.5,
             rot_factor=40.0, rot_prob=0.6),
)
target = dict(encoding='UDP', sigma=2.0)
pretrained = 'models/pretrained/mae_pretrain_vit_large.pth'
evaluation = dict(interval=1, metric='mAP', save_best='AP')
optimizer = dict(base_lr=6.25e-5, weight_decay=0.1,
                 layer_decay_rate=0.8, warmup_iters=100,
                 decay_epochs=(7,), total_epochs=10,
                 grad_clip_norm=1.0)
runtime = dict(work_dir='work_dirs/vitpose_l_simple_top_synthetic_256x192_coco_finetune')

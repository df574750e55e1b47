# ViTPose_small_coco_scratch_rotated_256x192: fork probe config rebuilt 1:1 (reference:
# configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/coco/ViTPose_small_coco_scratch_rotated_256x192.py)
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
    batch_size=64, canvas_size=640, num_workers=8, padding=1.25,
    train=dict(ann_file=f'{_DATA}/COCO/original' + '/annotations/'
                        'person_keypoints_train2017.json',
               img_prefix=f'{_DATA}/COCO/original' + '/train2017/',
               use_gt_bbox=True),
    val=dict(ann_file=f'{_DATA}/COCO/original' + '/annotations/'
                      'person_keypoints_val2017.json',
             img_prefix=f'{_DATA}/COCO/original' + '/val2017/', use_gt_bbox=True),
    aug=dict(flip_prob=0.5, half_body_prob=0.3, scale_factor=0.5,
             rot_factor=180.0, rot_prob=0.6),
)
target = dict(encoding='UDP', sigma=2.0)
# The reference config sets load_from=MAE with model.pretrained=None; stock
# mmcv load_checkpoint(strict=False) cannot match raw MAE keys (no
# 'backbone.' prefix) against the TopDown model, so the reference run
# effectively trained from RANDOM init. Reproduce that: no pretrained here.
evaluation = dict(interval=10, metric='mAP', save_best='AP')
optimizer = dict(base_lr=5e-4, weight_decay=0.1,
                 layer_decay_rate=0.8, warmup_iters=500,
                 decay_epochs=(170, 200, 290), total_epochs=300,
                 grad_clip_norm=1.0)
runtime = dict(work_dir='work_dirs/vitpose_s_coco_scratch_rotated_256x192')

# hrnet_w48_TOP_rotated_PoseFES_384x288: fork probe config rebuilt 1:1 (reference:
# configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/coco/hrnet_w48_TOP_rotated_PoseFES_384x288.py)
import os as _os
_DATA = _os.environ.get('VITPOSE_DATA_ROOT', '/data')
_base_ = ['../base/default_runtime.py']
model = dict(
    backbone_type='hrnet',
    backbone_overrides=dict(width=48, stage_modules=(1, 4, 3),
                            dtype='bfloat16'),
    img_size=(384, 288), out_channels=17, head='heatmap',
    deconv_filters=(), deconv_kernels=(), final_kernel=1,
    dtype='bfloat16', flip_test=True, post_process='default',
    use_udp=False, shift_heatmap=True, modulate_kernel=11,
)
data = dict(
    dataset='coco', image_size=(288, 384), heatmap_size=(72, 96),
    batch_size=32, canvas_size=640, num_workers=8, padding=1.25,
    train=dict(ann_file=f'{_DATA}/SyntheticPose/ViTPose_finetune_3k_TOP_with_COCO' + '/annotations/'
                        'person_keypoints_train2017.json',
               img_prefix=f'{_DATA}/SyntheticPose/ViTPose_finetune_3k_TOP_with_COCO' + '/train2017/',
               use_gt_bbox=True),
    val=dict(ann_file=f'{_DATA}/PoseFES/COCO_format_seq1' + '/annotations/'
                      'person_keypoints_val2017.json',
             img_prefix=f'{_DATA}/PoseFES/COCO_format_seq1' + '/val2017/', use_gt_bbox=True),
    aug=dict(flip_prob=0.5, half_body_prob=0.3, scale_factor=0.5,
             rot_factor=180.0, rot_prob=0.6),
)
target = dict(encoding='MSRA', sigma=3.0)
load_from = 'models/pretrained/hrnet_w48_coco_384x288-314c8528_20200708.pth'
evaluation = dict(interval=2, metric='mAP', save_best='AP')
optimizer = dict(base_lr=1e-4, warmup_iters=500,
                 decay_epochs=(170, 200), total_epochs=210)
runtime = dict(work_dir='work_dirs/hrnet_w48_top_rotated_posefes_384x288')

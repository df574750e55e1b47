# hrnet_w32_coco_256x192_fp16_dynamic: fork probe config rebuilt 1:1 (reference:
# configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/coco/hrnet_w32_coco_256x192_fp16_dynamic.py)
_base_ = ['../base/default_runtime.py']
model = dict(
    backbone_type='hrnet',
    backbone_overrides=dict(width=32, stage_modules=(1, 4, 3),
                            dtype='bfloat16'),
    img_size=(256, 192), out_channels=17, head='heatmap',
    deconv_filters=(), deconv_kernels=(), final_kernel=1,
    dtype='bfloat16', flip_test=True, post_process='default',
    use_udp=False, shift_heatmap=False, modulate_kernel=11,
)
data = dict(
    dataset='coco', image_size=(192, 256), heatmap_size=(48, 64),
    batch_size=64, canvas_size=640, num_workers=8, padding=1.25,
    train=dict(ann_file='data/coco' + '/annotations/'
                        'person_keypoints_train2017.json',
               img_prefix='data/coco' + '/train2017/',
               use_gt_bbox=True),
    val=dict(ann_file='data/coco' + '/annotations/'
                      'person_keypoints_val2017.json',
             img_prefix='data/coco' + '/val2017/', use_gt_bbox=True),
    aug=dict(flip_prob=0.5, half_body_prob=0.0, scale_factor=0.5,
             rot_factor=40.0, rot_prob=0.6),
)
target = dict(encoding='MSRA', sigma=2)
evaluation = dict(interval=10, metric='mAP', save_best='AP')
optimizer = dict(base_lr=5e-4, warmup_iters=500,
                 decay_epochs=(170, 200), total_epochs=210)
runtime = dict(work_dir='work_dirs/hrnet_w32_coco_256x192_fp16_dynamic')

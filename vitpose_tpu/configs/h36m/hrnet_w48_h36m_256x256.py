# hrnet_w48_h36m_256x256: 2D top-down on Human3.6M frames, EPE protocol (reference:
# configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/h36m/hrnet_w48_h36m_256x256.py)
import os as _os
_ROOT = _os.environ.get('H36M_ROOT', '/data/h36m')
_base_ = ['../base/default_runtime.py']

model = dict(
    backbone_type='hrnet',
    backbone_overrides=dict(width=48, stage_modules=(1, 4, 3),
                            dtype='bfloat16'),
    img_size=(256, 256),
    out_channels=17,
    head='heatmap',
    deconv_filters=(),
    dtype='bfloat16',
    flip_test=True,
    post_process='default',
    use_udp=False,
    shift_heatmap=True,
)
data = dict(
    dataset='h36m',
    image_size=(256, 256), heatmap_size=(64, 64),
    batch_size=64, canvas_size=1000, num_workers=8,
    train=dict(ann_file=f'{_ROOT}/annotation_body2d/h36m_coco_train.json',
               img_prefix=f'{_ROOT}/images/'),
    val=dict(ann_file=f'{_ROOT}/annotation_body2d/h36m_coco_test.json',
             img_prefix=f'{_ROOT}/images/', use_gt_bbox=True),
    aug=dict(flip_prob=0.5, half_body_prob=0.3, scale_factor=0.5,
             rot_factor=40.0, rot_prob=0.6),
)
target = dict(encoding='MSRA', sigma=2.0)
evaluation = dict(metric=['EPE'], save_best='EPE', save_best_mode='min')
optimizer = dict(base_lr=5e-4, warmup_iters=500, decay_epochs=(170, 200),
                 total_epochs=210)
runtime = dict(work_dir='work_dirs/hrnet_w48_h36m_256x256')

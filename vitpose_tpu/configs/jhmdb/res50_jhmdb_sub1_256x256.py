# SimpleBaseline ResNet-50 on sub-JHMDB split 1 (15 kpts, PCK/tPCK)
# (reference: configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/jhmdb/
#  res50_jhmdb_sub1_256x256.py: lr 5e-4, step [8, 15], 20 epochs)
import os as _os
_ROOT = _os.environ.get('JHMDB_ROOT', '/data/jhmdb')
_base_ = ['../base/default_runtime.py']

model = dict(
    backbone_type='resnet',
    backbone_overrides=dict(depth=50),
    img_size=(256, 256),
    out_channels=15,
    head='heatmap',
    deconv_filters=(256, 256, 256),
    deconv_kernels=(4, 4, 4),
    flip_test=True,
    post_process='default',
    use_udp=False,
    shift_heatmap=True,
    modulate_kernel=11,
)
data = dict(
    dataset='jhmdb',
    image_size=(256, 256), heatmap_size=(64, 64),
    batch_size=64, canvas_size=640, num_workers=8,
    train=dict(ann_file=f'{_ROOT}/annotations/Sub1_train.json',
               img_prefix=f'{_ROOT}/'),
    val=dict(ann_file=f'{_ROOT}/annotations/Sub1_test.json',
             img_prefix=f'{_ROOT}/', use_gt_bbox=True),
    aug=dict(flip_prob=0.5, half_body_prob=0.3, scale_factor=0.5,
             rot_factor=40.0, rot_prob=0.6),
)
target = dict(encoding='MSRA', sigma=2.0)
evaluation = dict(interval=1, metric=['PCK', 'tPCK'],
                  save_best='Mean PCK')
optimizer = dict(base_lr=5e-4, warmup_iters=500, decay_epochs=(8, 15),
                 total_epochs=20)
runtime = dict(work_dir='work_dirs/res50_jhmdb_sub1_256x256')

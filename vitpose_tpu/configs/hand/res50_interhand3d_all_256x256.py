# InterNet ResNet-50 on InterHand2.6M (42 kpts, 2.5D volumes + rel-root
# depth + hand type)
# (reference: configs/hand/3d_kpt_sview_rgb_img/internet/interhand3d/
#  res50_interhand3d_all_256x256.py)
import os as _os
_ROOT = _os.environ.get('INTERHAND_ROOT', '/data/interhand2.6m')
_base_ = ['../base/default_runtime.py']

model = dict(
    family='interhand3d',
    backbone_type='resnet',
    backbone_overrides=dict(depth=50),
    num_joints=42,
    depth_size=64,
    heatmap_size=(64, 64),
    depth_range_mm=400.0,
    root_depth_range_mm=400.0,
    # reference InterNet layout: separate right/left Heatmap3DHead stacks,
    # 3 deconv layers of 256 (res50_interhand3d_all_256x256.py:39-46)
    split_hands=True,
    deconv_filters=(256, 256, 256),
)
data = dict(
    dataset='interhand3d',
    image_size=(256, 256), heatmap_size=(64, 64),
    batch_size=16, canvas_size=512, num_workers=8,
    train=dict(
        ann_file=f'{_ROOT}/annotations/all/InterHand2.6M_train_data.json',
        camera_file=f'{_ROOT}/annotations/all/'
                    'InterHand2.6M_train_camera.json',
        joint_file=f'{_ROOT}/annotations/all/'
                   'InterHand2.6M_train_joint_3d.json',
        img_prefix=f'{_ROOT}/images/train/'),
    val=dict(
        ann_file=f'{_ROOT}/annotations/machine_annot/'
                 'InterHand2.6M_val_data.json',
        camera_file=f'{_ROOT}/annotations/machine_annot/'
                    'InterHand2.6M_val_camera.json',
        joint_file=f'{_ROOT}/annotations/machine_annot/'
                   'InterHand2.6M_val_joint_3d.json',
        img_prefix=f'{_ROOT}/images/val/', use_gt_bbox=True),
    aug=dict(flip_prob=0.0, half_body_prob=0.0, scale_factor=0.25,
             rot_factor=45.0, rot_prob=0.6),
)
# 2.5D gaussian volumes + HandGenerateRelDepthTarget bins
target = dict(encoding='3d_gaussian', sigma=2.5, depth_bound=400.0,
              root_depth_bins=64, root_depth_bound=400.0)
evaluation = dict(metric=['MRRPE', 'MPJPE', 'Handedness_acc'],
                  save_best='MPJPE', less_is_better=True)
optimizer = dict(base_lr=0.0002, warmup_iters=500, decay_epochs=(15, 17),
                 total_epochs=20)
runtime = dict(work_dir='work_dirs/res50_interhand3d_all_256x256')

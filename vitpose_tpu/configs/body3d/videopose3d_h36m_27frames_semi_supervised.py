# VideoPose3D semi-supervised lifting on Human3.6M (reference: configs/
# body/3d_kpt_sview_rgb_vid/video_pose_lift/h36m/
# videopose3d_h36m_27frames_fullconv_semi-supervised.py): labeled MPJPE +
# trajectory head + unlabeled projection/bone consistency
# (models/pose3d.py PoseLifter(with_traj=True),
# losses_regression.semi_supervision_loss,
# data/body3d.py Body3DSemiSupervisionDataset).
import os as _os
_ROOT = _os.environ.get('H36M_ROOT', '/data/h36m')
_base_ = ['../base/default_runtime.py']

model = dict(
    family='pose_lifter',
    num_joints=17,
    stem_channels=1024,
    kernel_sizes=(3, 3, 3),        # receptive field 27
    with_traj=True,
)
loss_semi = dict(
    projection_loss_weight=1.0,
    bone_loss_weight=1.0,
    warmup_epochs=5,
    # H36M joint parents for the bone term (reference semi config
    # loss_semi.joint_parents)
    joint_parents=[0, 0, 1, 2, 0, 4, 5, 0, 7, 8, 9, 8, 11, 12, 8, 14, 15],
)
data = dict(
    dataset='h36m', family='body3d', semi_supervised=True,
    seq_len=27, causal=False, batch_size=64, num_workers=8,
    train=dict(ann_file=f'{_ROOT}/annotation_body3d/fps50/'
                        'h36m_train.npz',
               camera_param_file=f'{_ROOT}/annotation_body3d/'
                                 'cameras.pkl'),
    train_unlabeled=dict(ann_file=f'{_ROOT}/annotation_body3d/fps50/'
                                  'h36m_train_unlabeled.npz',
                         camera_param_file=f'{_ROOT}/annotation_body3d/'
                                           'cameras.pkl'),
    val=dict(ann_file=f'{_ROOT}/annotation_body3d/fps50/h36m_test.npz',
             camera_param_file=f'{_ROOT}/annotation_body3d/cameras.pkl'),
)
evaluation = dict(interval=10, metric=['mpjpe', 'p-mpjpe', 'n-mpjpe'])
optimizer = dict(base_lr=1e-3, lr_decay=0.975, total_epochs=160)
runtime = dict(work_dir='work_dirs/videopose3d_h36m_27frames_semi',
               save_best='MPJPE', save_best_mode='min')

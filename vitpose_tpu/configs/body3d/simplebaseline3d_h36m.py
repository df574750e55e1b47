# SimpleBaseline3D (Martinez et al.) single-frame 2D->3D lifting on
# Human3.6M (reference: configs/body/3d_kpt_sview_rgb_img/pose_lift/h36m/
# simplebaseline3d_h36m.py): kernel-1 TCN, root-removed 16-joint target,
# mean/std NormalizeJointCoordinate on both input_2d and target, MSE loss.
import os as _os
_ROOT = _os.environ.get('H36M_ROOT', '/data/h36m')
_base_ = ['../base/default_runtime.py']

model = dict(
    family='pose_lifter',
    num_joints=16,                 # root removed
    stem_channels=1024,
    kernel_sizes=(1, 1, 1),
    dropout=0.5,
    remove_root=True,
    loss='mse',
)
# NormalizeJointCoordinate stats (the reference config embeds the values
# it quotes from these files)
joint_3d_normalize = dict(
    stats_file=f'{_ROOT}/annotation_body3d/fps50/joint3d_rel_stats.pkl')
joint_2d_normalize = dict(
    stats_file=f'{_ROOT}/annotation_body3d/fps50/joint2d_stats.pkl')
data = dict(
    dataset='h36m', family='body3d',
    seq_len=1, causal=True, batch_size=64, num_workers=8,
    flip_aug=False,                # the reference pipeline has no flip
    train=dict(ann_file=f'{_ROOT}/annotation_body3d/fps50/h36m_train.npz'),
    val=dict(ann_file=f'{_ROOT}/annotation_body3d/fps50/h36m_test.npz'),
)
evaluation = dict(interval=10, metric=['mpjpe', 'p-mpjpe', 'n-mpjpe'])
optimizer = dict(base_lr=1e-3, lr_decay=0.975, total_epochs=200)
runtime = dict(work_dir='work_dirs/simplebaseline3d_h36m',
               save_best='MPJPE', save_best_mode='min')

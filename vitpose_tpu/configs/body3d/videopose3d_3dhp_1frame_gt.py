# VideoPose3D single-frame on MPI-INF-3DHP ground-truth 2D (reference:
# configs/body/3d_kpt_sview_rgb_vid/video_pose_lift/mpi_inf_3dhp/
# videopose3d_mpi-inf-3dhp_1frame_fullconv_supervised_gt.py)
import os as _os
_ROOT = _os.environ.get('MPI_INF_3DHP_ROOT', '/data/mpi_inf_3dhp')
_base_ = ['../base/default_runtime.py']
model = dict(
    family='pose_lifter',
    num_joints=17,
    stem_channels=1024,
    kernel_sizes=(1, 1, 1, 1, 1),
)
data = dict(
    dataset='mpi_inf_3dhp', family='body3d',
    seq_len=1, causal=False, batch_size=128, num_workers=8,
    train=dict(ann_file=f'{_ROOT}/annotations/mpi_inf_3dhp_train.npz',
               camera_param_file=f'{_ROOT}/annotations/cameras_train.pkl'),
    val=dict(ann_file=f'{_ROOT}/annotations/mpi_inf_3dhp_test_valid.npz',
             camera_param_file=f'{_ROOT}/annotations/cameras_test.pkl'),
)
evaluation = dict(interval=10,
                  metric=['mpjpe', 'p-mpjpe', '3dpck', '3dauc'])
optimizer = dict(base_lr=1e-4, lr_decay=0.98, total_epochs=160)
runtime = dict(work_dir='work_dirs/videopose3d_3dhp_1frame_gt',
               save_best='MPJPE', save_best_mode='min')

# SimpleBaseline3D (Martinez et al.) on MPI-INF-3DHP (reference:
# configs/body/3d_kpt_sview_rgb_img/pose_lift/mpi_inf_3dhp/
# simplebaseline3d_mpi-inf-3dhp.py)
import os as _os
_ROOT = _os.environ.get('MPI_INF_3DHP_ROOT', '/data/mpi_inf_3dhp')
_base_ = ['simplebaseline3d_h36m.py']
joint_3d_normalize = dict(
    stats_file=f'{_ROOT}/annotations/joint3d_rel_stats.pkl')
joint_2d_normalize = dict(
    stats_file=f'{_ROOT}/annotations/joint2d_stats.pkl')
data = dict(
    dataset='mpi_inf_3dhp',
    train=dict(ann_file=f'{_ROOT}/annotations/mpi_inf_3dhp_train.npz',
               _delete_=True),
    val=dict(ann_file=f'{_ROOT}/annotations/mpi_inf_3dhp_test_valid.npz',
             _delete_=True),
)
evaluation = dict(interval=10,
                  metric=['mpjpe', 'p-mpjpe', '3dpck', '3dauc'])
runtime = dict(work_dir='work_dirs/simplebaseline3d_3dhp',
               save_best='MPJPE', save_best_mode='min')

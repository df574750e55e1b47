# VideoPose3D 27-frame semi-supervised training on CPN 2D detections
# (reference: configs/body/3d_kpt_sview_rgb_vid/video_pose_lift/h36m/
# videopose3d_h36m_27frames_fullconv_semi-supervised_cpn_ft.py)
import os as _os
_ROOT = _os.environ.get('H36M_ROOT', '/data/h36m')
_base_ = ['videopose3d_h36m_27frames_semi_supervised.py']
data = dict(
    train=dict(det_file=f'{_ROOT}/joint_2d_det_files/'
                        'cpn_ft_h36m_dbb_train.npy'),
    val=dict(det_file=f'{_ROOT}/joint_2d_det_files/'
                      'cpn_ft_h36m_dbb_test.npy'),
)
runtime = dict(
    work_dir='work_dirs/videopose3d_h36m_27frames_semi_supervised_cpn_ft',
    save_best='MPJPE', save_best_mode='min')

# VideoPose3D 243 frames on CPN-detected 2D keypoints (reference:
# configs/body/3d_kpt_sview_rgb_vid/video_pose_lift/h36m/
# videopose3d_h36m_243frames_fullconv_supervised_cpn_ft.py)
import os as _os
_ROOT = _os.environ.get('H36M_ROOT', '/data/h36m')
_base_ = ['videopose3d_h36m_243frames.py']
data = dict(
    train=dict(det_file=f'{_ROOT}/joint_2d_det_files/'
                        'cpn_ft_h36m_dbb_train.npy'),
    val=dict(det_file=f'{_ROOT}/joint_2d_det_files/'
                      'cpn_ft_h36m_dbb_test.npy'),
)
optimizer = dict(base_lr=1e-4, lr_decay=0.98, total_epochs=200)
runtime = dict(work_dir='work_dirs/videopose3d_h36m_243frames_cpn_ft',
               save_best='MPJPE', save_best_mode='min')

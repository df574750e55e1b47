# VideoPose3D, 81-frame receptive field (reference: configs/body/
# 3d_kpt_sview_rgb_vid/video_pose_lift/h36m/
# videopose3d_h36m_81frames_fullconv_supervised.py)
_base_ = ['videopose3d_h36m_27frames.py']
model = dict(kernel_sizes=(3, 3, 3, 3))
data = dict(seq_len=81)
runtime = dict(work_dir='work_dirs/videopose3d_h36m_81frames',
               save_best='MPJPE', save_best_mode='min')

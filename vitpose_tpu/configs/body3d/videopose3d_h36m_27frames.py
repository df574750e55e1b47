# VideoPose3D temporal lifter on Human3.6M (reference: configs/body/
# 3d_kpt_sview_rgb_vid/video_pose_lift/h36m/
# videopose3d_h36m_27frames_fullconv_supervised.py): dilated TCN over
# 27-frame 2D keypoint windows -> root-relative 3D pose.
import os as _os
_ROOT = _os.environ.get('H36M_ROOT', '/data/h36m')
_base_ = ['../base/default_runtime.py']

model = dict(
    family='pose_lifter',
    num_joints=17,
    stem_channels=1024,
    kernel_sizes=(3, 3, 3),        # receptive field 27
)
data = dict(
    dataset='h36m', family='body3d',
    seq_len=27, causal=False, batch_size=128, num_workers=8,
    train=dict(ann_file=f'{_ROOT}/annotation_body3d/fps50/'
                        'h36m_train.npz',
               camera_param_file=f'{_ROOT}/annotation_body3d/'
                                 'cameras.pkl'),
    val=dict(ann_file=f'{_ROOT}/annotation_body3d/fps50/h36m_test.npz',
             camera_param_file=f'{_ROOT}/annotation_body3d/cameras.pkl'),
)
evaluation = dict(interval=10, metric=['mpjpe', 'p-mpjpe', 'n-mpjpe'])
optimizer = dict(base_lr=1e-3, lr_decay=0.975, total_epochs=160)
runtime = dict(work_dir='work_dirs/videopose3d_h36m_27frames',
               save_best='MPJPE', save_best_mode='min')

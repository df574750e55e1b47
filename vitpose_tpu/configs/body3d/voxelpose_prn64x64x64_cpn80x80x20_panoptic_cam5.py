# VoxelPose on CMU Panoptic (5 HD cameras): whole-space center detection
# (cube 80x80x20 over 8x8x2 m) + per-proposal pose regression (cube 64³
# over 2 m)
# (reference: configs/body/3d_kpt_mview_rgb_img/voxelpose/panoptic/
#  voxelpose_prn64x64x64_cpn80x80x20_panoptic_cam5.py)
import os as _os
_ROOT = _os.environ.get('PANOPTIC_ROOT', '/data/panoptic')
_base_ = ['../base/default_runtime.py']

model = dict(
    family='voxelpose',
    num_joints=15,
    space_size=(8000, 8000, 2000),
    space_center=(0, -500, 800),
    space_resolution=(80, 80, 20),
    cube_size=(2000, 2000, 2000),
    cube_resolution=(64, 64, 64),
    mid_channels=32,
    beta=100.0,
    max_people=10,
    center_threshold=0.3,
)
data = dict(
    dataset='panoptic_body3d',
    image_size=(960, 512), heatmap_size=(240, 128),
    batch_size=1, num_workers=4,
    # the reference's CMU-panoptic 5-HD-camera setup (cam_list (0,12)... ->
    # panoptic calibration names '00_12'...)
    train=dict(seq_dirs=(f'{_ROOT}/160906_band1', f'{_ROOT}/160906_band2'),
               cam_names=('00_12', '00_06', '00_13', '00_04', '00_03'),
               seq_frame_interval=3),
    val=dict(seq_dirs=(f'{_ROOT}/160906_band3',),
             cam_names=('00_12', '00_06', '00_13', '00_04', '00_03'),
             seq_frame_interval=12),
)
# GenerateVoxel3DHeatmapTarget: center targets over the space grid (roots,
# sigma mm); pose supervision is metric L1 on the regressed joints
target = dict(encoding='voxel_3d_gaussian', sigma=200.0)
evaluation = dict(metric=['mpjpe', 'mAP'], save_best='mAP')
optimizer = dict(base_lr=0.0001, warmup_iters=500, decay_epochs=(9, 11),
                 total_epochs=15)
runtime = dict(work_dir='work_dirs/voxelpose_panoptic_cam5')

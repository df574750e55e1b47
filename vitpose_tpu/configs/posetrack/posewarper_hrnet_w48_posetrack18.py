# PoseWarper video pose on PoseTrack18 (reference: configs/body/
# 2d_kpt_sview_rgb_vid/posewarper/posetrack18/
# hrnet_w48_posetrack18_384x288_posewarper_stage2.py): HRNet-W48
# backbone, deformable temporal-alignment neck over 5-frame windows.
import os as _os
_ROOT = _os.environ.get('POSETRACK_ROOT', '/data/posetrack18')
_base_ = ['../base/default_runtime.py']

model = dict(
    family='posewarper',
    backbone_type='hrnet',
    backbone_overrides=dict(width=48, stage_modules=(1, 4, 3)),
    # reference neck recipe (hrnet_w48_..._posewarper_stage2.py:70-78):
    # trans to 17 heatmap channels, 128 inner offset features, 20
    # BasicBlocks, one offset field per joint (deform_groups=0 -> one
    # group per output channel = 17)
    neck=dict(out_channels=17, inner_channels=128, num_blocks=20,
              trans_conv_kernel=1, dilations=(3, 6, 12, 18, 24)),
    out_channels=17,
)
data = dict(
    dataset='posetrack18', family='posetrack_video',
    image_size=(288, 384), heatmap_size=(72, 96),
    # test window (reference frame_indices_test); training samples ONE
    # random adjacent frame per record (frame_index_rand, stage-2
    # recipe) with frame_weight_train=(0.0, 1.0) — only the warped
    # support feature is supervised
    frame_indices=(-2, -1, 0, 1, 2),
    frame_index_range=(-2, 2), num_adj_frames=1,
    frame_weight_train=(0.0, 1.0),
    batch_size=16, num_workers=8,
    aug=dict(flip_prob=0.5, half_body_prob=0.3, scale_factor=0.35,
             rot_factor=45, rot_prob=0.6),
    train=dict(ann_file=f'{_ROOT}/annotations/posetrack18_train.json',
               img_prefix=f'{_ROOT}/'),
    val=dict(ann_file=f'{_ROOT}/annotations/posetrack18_val.json',
             img_prefix=f'{_ROOT}/',
             bbox_file=f'{_ROOT}/detections/'
                       'posetrack18_val_human_detections.json'),
)
target = dict(encoding='MSRA', sigma=3.0)
test_cfg = dict(flip_test=True, shift_heatmap=True,
                post_process='default')
optimizer = dict(base_lr=1e-4, decay_epochs=(10, 15), total_epochs=20)
runtime = dict(work_dir='work_dirs/posewarper_hrnet_w48_posetrack18')

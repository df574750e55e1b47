# PoseWarper stage 1: single-frame HRNet-W48 finetune on PoseTrack18
# before temporal-warping training (reference: configs/body/
# 2d_kpt_sview_rgb_vid/posewarper/posetrack18/
# hrnet_w48_posetrack18_384x288_posewarper_stage1.py)
_base_ = ['hrnet_w48_posetrack18_384x288.py']
optimizer = dict(base_lr=1e-4, decay_epochs=(10, 15), total_epochs=20)
runtime = dict(work_dir='work_dirs/posewarper_stage1')

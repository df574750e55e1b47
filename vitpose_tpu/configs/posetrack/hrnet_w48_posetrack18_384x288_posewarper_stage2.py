# PoseWarper stage 2: deformable temporal-alignment training; alias of
# the posewarper config under the reference's stage-2 name (reference:
# configs/body/2d_kpt_sview_rgb_vid/posewarper/posetrack18/
# hrnet_w48_posetrack18_384x288_posewarper_stage2.py)
_base_ = ['posewarper_hrnet_w48_posetrack18.py']
runtime = dict(work_dir='work_dirs/posewarper_stage2')

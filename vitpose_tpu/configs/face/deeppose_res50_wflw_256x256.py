# DeepPose ResNet-50 regression on WFLW
# (reference: configs/face/2d_kpt_sview_rgb_img/deeppose/wflw/res50_wflw_256x256.py)
_base_ = ['deeppose_res50_wflw_256x256_wingloss.py']
model = dict(reg_loss='smooth_l1')
runtime = dict(work_dir='work_dirs/deeppose_res50_wflw_256x256')

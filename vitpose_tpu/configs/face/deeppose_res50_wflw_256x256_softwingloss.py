# DeepPose ResNet-50 regression on WFLW with SoftWing loss
# (reference: configs/face/2d_kpt_sview_rgb_img/deeppose/wflw/res50_wflw_256x256_softwingloss.py)
_base_ = ['deeppose_res50_wflw_256x256_wingloss.py']
model = dict(reg_loss='soft_wing')
runtime = dict(work_dir='work_dirs/deeppose_res50_wflw_256x256_softwingloss')

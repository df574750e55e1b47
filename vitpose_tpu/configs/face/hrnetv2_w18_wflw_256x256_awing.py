# hrnetv2_w18_wflw_256x256_awing: AdaptiveWingLoss training (reference: configs/face/2d_kpt_sview_rgb_img/topdown_heatmap/wflw/hrnetv2_w18_wflw_256x256_awing.py)
_base_ = ['../face/hrnetv2_w18_wflw_256x256.py']

model = dict(heatmap_loss='awing')
runtime = dict(work_dir='work_dirs/hrnetv2_w18_wflw_256x256_awing')

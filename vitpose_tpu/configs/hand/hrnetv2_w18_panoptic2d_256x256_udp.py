# hrnetv2_w18_panoptic2d_256x256_udp: UDP (unbiased data processing) variant (reference: configs/hand/2d_kpt_sview_rgb_img/topdown_heatmap/panoptic2d/hrnetv2_w18_panoptic2d_256x256_udp.py)
_base_ = ['../hand/hrnetv2_w18_panoptic2d_256x256.py']

model = dict(use_udp=True, post_process='default', shift_heatmap=False,
             target_type='GaussianHeatmap')
target = dict(encoding='UDP', sigma=2.0)
runtime = dict(work_dir='work_dirs/hrnetv2_w18_panoptic2d_256x256_udp')

# hrnetv2_w18_onehand10k_256x256_dark: DARK decode variant (reference: configs/hand/2d_kpt_sview_rgb_img/topdown_heatmap/onehand10k/hrnetv2_w18_onehand10k_256x256_dark.py)
_base_ = ['../hand/hrnetv2_w18_onehand10k_256x256.py']

model = dict(post_process='unbiased', modulate_kernel=11)
target = dict(encoding='MSRA', sigma=2.0, unbiased=True)
runtime = dict(work_dir='work_dirs/hrnetv2_w18_onehand10k_256x256_dark')

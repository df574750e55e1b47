# HRNet-W48 on Animal-Pose (reference:
# configs/animal/2d_kpt_sview_rgb_img/topdown_heatmap/animalpose/hrnet_w48_animalpose_256x256.py)
_base_ = ['../animal/hrnet_w32_animalpose_256x256.py']

model = dict(backbone_overrides=dict(width=48, stage_modules=(1, 4, 3),
                                     dtype='bfloat16'))
runtime = dict(work_dir='work_dirs/hrnet_w48_animalpose_256x256')

# HRNet-W32 top-down COCO + coarsedropout image augmentation (reference:
# configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/coco/hrnet_w32_coco_256x192_coarsedropout.py — the reference applies it
# via Albumentations after TopDownAffine; here the native counterpart
# runs on the host canvas, see data/pipeline.py)
_base_ = ['../coco/hrnet_w32_coco_256x192.py']

data = dict(aug=dict(flip_prob=0.5, half_body_prob=0.3, scale_factor=0.5,
                     rot_factor=40.0, rot_prob=0.6,
                     coarse_dropout=dict(max_holes=8, max_height=40, max_width=40,
                              min_holes=1, min_height=10, min_width=10, p=0.5)))
runtime = dict(work_dir='work_dirs/hrnet_w32_coco_256x192_coarsedropout')

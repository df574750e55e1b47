# HRNet-W32 top-down COCO + gridmask image augmentation (reference:
# configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/coco/hrnet_w32_coco_256x192_gridmask.py — the reference applies it
# via Albumentations after TopDownAffine; here the native counterpart
# runs on the host canvas, see data/pipeline.py)
_base_ = ['../coco/hrnet_w32_coco_256x192.py']

data = dict(aug=dict(flip_prob=0.5, half_body_prob=0.3, scale_factor=0.5,
                     rot_factor=40.0, rot_prob=0.6,
                     grid_dropout=dict(unit_size_min=10, unit_size_max=40, random_offset=True,
                            p=0.5)))
runtime = dict(work_dir='work_dirs/hrnet_w32_coco_256x192_gridmask')

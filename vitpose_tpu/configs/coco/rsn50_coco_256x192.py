# 1xRSN-50 top-down COCO (reference:
# configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/coco/rsn50_coco_256x192.py)
_base_ = ['../coco/3xrsn50_coco_256x192.py']

model = dict(num_stages=1,
             backbone_overrides=dict(dtype='bfloat16', num_stages=1,
                                     num_units=4, num_blocks=(3, 4, 6, 3),
                                     unit_channels=256, num_steps=4,
                                     expand_times=26))
runtime = dict(work_dir='work_dirs/rsn50_coco_256x192')

# 2xMSPN-50 top-down COCO (reference:
# configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/coco/2xmspn50_coco_256x192.py)
_base_ = ['../coco/mspn50_coco_256x192.py']

model = dict(num_stages=2,
             backbone_overrides=dict(dtype='bfloat16', num_stages=2,
                                     num_units=4, num_blocks=(3, 4, 6, 3),
                                     unit_channels=256))
runtime = dict(work_dir='work_dirs/2xmspn50_coco_256x192')

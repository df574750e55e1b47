# SimpleBaseline ResNet-50 + AdaptiveWingLoss (reference:
# configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/coco/res50_coco_256x192_awing.py)
_base_ = ['../coco/res50_coco_256x192.py']

model = dict(heatmap_loss='awing')
runtime = dict(work_dir='work_dirs/res50_coco_256x192_awing')

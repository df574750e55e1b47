# Lite-HRNet-18 top-down COCO at 384x288 (reference:
# configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/coco/litehrnet_18_coco_384x288.py)
_base_ = ['../coco/litehrnet_18_coco_256x192.py']

model = dict(img_size=(384, 288))
data = dict(image_size=(288, 384), heatmap_size=(72, 96))
target = dict(encoding='MSRA', sigma=3.0)
runtime = dict(work_dir='work_dirs/litehrnet_18_coco_384x288')

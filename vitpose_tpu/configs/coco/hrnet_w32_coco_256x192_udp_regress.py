# HRNet-W32 + UDP combined classification/regression target (reference:
# configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/coco/hrnet_w32_coco_256x192_udp_regress.py:
# target_type='CombinedTarget' -> 3K channels, head regresses offsets)
_base_ = ['../coco/hrnet_w32_coco_256x192_udp.py']

model = dict(target_type='CombinedTarget')
runtime = dict(work_dir='work_dirs/hrnet_w32_coco_256x192_udp_regress')

# SimpleBaseline Res50 in reduced precision (reference:
# configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/coco/
# res50_coco_256x192_fp16_dynamic.py — torch fp16 dynamic loss scaling;
# on TPU the counterpart is bf16 compute, which needs no loss scaling).
_base_ = ['res50_coco_256x192.py']
model = dict(dtype='bfloat16')
runtime = dict(work_dir='work_dirs/res50_coco_256x192_fp16_dynamic')

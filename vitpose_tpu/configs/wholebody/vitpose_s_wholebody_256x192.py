# ViTPose-S on wholebody — size variant of the B recipe
# (reference: configs/wholebody/2d_kpt_sview_rgb_img/topdown_heatmap/coco-wholebody/ViTPose_small_wholebody_256x192.py)
_base_ = ['vitpose_b_wholebody_256x192.py']
model = dict(variant='s')
optimizer = dict(layer_decay_rate=0.8)
runtime = dict(work_dir='work_dirs/vitpose_s_wholebody')

# ViTPose-S on aic — size variant of the B recipe
# (reference: configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/aic/ViTPose_small_aic_256x192.py)
_base_ = ['vitpose_b_aic_256x192.py']
model = dict(variant='s')
optimizer = dict(layer_decay_rate=0.8)
runtime = dict(work_dir='work_dirs/vitpose_s_aic')

# ViTPose-H on aic — size variant of the B recipe
# (reference: configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/aic/ViTPose_huge_aic_256x192.py)
_base_ = ['vitpose_b_aic_256x192.py']
model = dict(variant='h')
optimizer = dict(layer_decay_rate=0.85)
runtime = dict(work_dir='work_dirs/vitpose_h_aic')

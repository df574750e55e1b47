# ViTPose-L on ap10k — size variant of the B recipe
# (reference: configs/animal/2d_kpt_sview_rgb_img/topdown_heatmap/ap10k/ViTPose_large_ap10k_256x192.py)
_base_ = ['vitpose_b_ap10k_256x192.py']
model = dict(variant='l')
optimizer = dict(layer_decay_rate=0.8)
runtime = dict(work_dir='work_dirs/vitpose_l_ap10k')

# ViTPose-L on apt36k — size variant of the B recipe
# (reference: configs/animal/2d_kpt_sview_rgb_img/topdown_heatmap/apt36k/ViTPose_large_apt36k_256x192.py)
_base_ = ['vitpose_b_apt36k_256x192.py']
model = dict(variant='l')
optimizer = dict(layer_decay_rate=0.8)
runtime = dict(work_dir='work_dirs/vitpose_l_apt36k')

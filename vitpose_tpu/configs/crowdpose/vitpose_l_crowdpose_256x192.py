# ViTPose-L on crowdpose — size variant of the B recipe
# (reference: configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/crowdpose/ViTPose_large_crowdpose_256x192.py)
_base_ = ['vitpose_b_crowdpose_256x192.py']
model = dict(variant='l')
optimizer = dict(layer_decay_rate=0.8)
runtime = dict(work_dir='work_dirs/vitpose_l_crowdpose')

# SimpleBaseline ResNet-152 on MPII-TRB (reference:
# configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/mpii_trb/res152_mpii_trb_256x256.py)
_base_ = ['../mpii/res50_mpii_trb_256x256.py']

model = dict(backbone_overrides=dict(depth=152))
runtime = dict(work_dir='work_dirs/res152_mpii_trb_256x256')

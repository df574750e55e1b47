# Hourglass-52 on MPII at 384x384 (reference:
# configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/mpii/hourglass52_mpii_384x384.py)
_base_ = ['../mpii/hourglass52_mpii_256x256.py']

model = dict(img_size=(384, 384))
data = dict(image_size=(384, 384), heatmap_size=(96, 96))
target = dict(encoding='MSRA', sigma=3.0)
runtime = dict(work_dir='work_dirs/hourglass52_mpii_384x384')

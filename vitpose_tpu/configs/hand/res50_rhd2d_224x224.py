# SimpleBaseline ResNet-50 on RHD hand 2D at 224x224
# (reference: configs/hand/2d_kpt_sview_rgb_img/topdown_heatmap/rhd2d/
#  res50_rhd2d_224x224.py)
_base_ = ['res50_rhd2d_256x256.py']
model = dict(img_size=(224, 224))
data = dict(image_size=(224, 224), heatmap_size=(56, 56))
runtime = dict(work_dir='work_dirs/res50_rhd2d_224x224')

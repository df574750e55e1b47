# ViTPose+ small 6-dataset MoE recipe under the reference's exact
# config name; alias of vitpose_plus_s_6datasets_256x192 (reference:
# configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/coco/
# vitPose+_small_coco+aic+mpii+ap10k+apt36k+wholebody_256x192_udp.py)
_base_ = ['vitpose_plus_s_6datasets_256x192.py']

# ViTPose+ -S: 6-dataset multi-task MoE (reference configs/.../
# vitPose+_small_coco+aic+mpii+ap10k+apt36k+wholebody_256x192_udp.py:
# embed 384, part_features=192, dpr 0.1).
_base_ = ['vitpose_plus_b_6datasets_256x192.py']
model = dict(variant='s', part_dim=192)
runtime = dict(work_dir='work_dirs/vitpose_plus_s_6datasets')

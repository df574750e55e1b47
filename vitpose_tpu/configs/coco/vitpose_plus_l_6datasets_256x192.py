# ViTPose+ -L: 6-dataset multi-task MoE (reference configs/.../
# vitPose+_large_coco+aic+mpii+ap10k+apt36k+wholebody_256x192_udp.py:
# embed 1024, part_features=256, dpr 0.5).
_base_ = ['vitpose_plus_b_6datasets_256x192.py']
model = dict(variant='l', part_dim=256)
runtime = dict(work_dir='work_dirs/vitpose_plus_l_6datasets')

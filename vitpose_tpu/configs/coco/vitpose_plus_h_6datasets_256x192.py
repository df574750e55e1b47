# ViTPose+ -H: 6-dataset multi-task MoE (reference configs/.../
# vitPose+_huge_coco+aic+mpii+ap10k+apt36k+wholebody_256x192_udp.py:
# embed 1280, part_features=320, dpr 0.55).
_base_ = ['vitpose_plus_b_6datasets_256x192.py']
model = dict(variant='h', part_dim=320)
runtime = dict(work_dir='work_dirs/vitpose_plus_h_6datasets')

# ViTPose-B simple decoder (upsample+conv head), lr 2e-4 (reference:
# ViTPose_b_simple_coco_256x192.py)
_base_ = ['vitpose_b_coco_256x192.py']
model = dict(head='simple', upsample=4)
optimizer = dict(base_lr=2e-4)
runtime = dict(work_dir='work_dirs/vitpose_b_simple_coco_256x192')

# Hourglass-AE (Newell associative embedding) bottom-up COCO (reference:
# configs/.../associative_embedding/coco/hourglass_ae_coco_512x512.py —
# 4-stack HourglassAENet emitting 34-channel prediction maps, identity
# multi-stage head, test protocol selects the last stage).
import os as _os
_COCO_ROOT = _os.environ.get('COCO_ROOT', '/data/coco')
_base_ = ['../base/default_runtime.py']

model = dict(
    family='bottomup',
    backbone_type='hourglass_ae',
    backbone_overrides=dict(num_stacks=4, out_channels=34),
    head='ae_multi',
    head_overrides=dict(out_channels=34, num_stages=4,
                        num_deconv_layers=0, deconv_filters=(),
                        deconv_kernels=(), final_kernel=0),
    num_joints=17,
    dataset_info='coco',
)
data = dict(
    dataset='coco', family='bottomup',
    input_size=512, output_sizes=(128,), base_size=256,
    max_people=30, batch_size=16, num_workers=8,
    test_scale_factor=(1.0,), use_udp=False,
    train=dict(
        ann_file=f'{_COCO_ROOT}/annotations/'
                 'person_keypoints_train2017.json',
        img_prefix=f'{_COCO_ROOT}/train2017/'),
    val=dict(
        ann_file=f'{_COCO_ROOT}/annotations/person_keypoints_val2017.json',
        img_prefix=f'{_COCO_ROOT}/val2017/'),
)
target = dict(sigma=2.0)
optimizer = dict(base_lr=1.5e-3, warmup_iters=500, decay_epochs=(200, 260),
                 total_epochs=300)
runtime = dict(work_dir='work_dirs/hourglass_ae_coco_512x512')

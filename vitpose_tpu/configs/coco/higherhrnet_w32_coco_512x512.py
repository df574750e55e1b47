# HigherHRNet-W32 bottom-up COCO (reference: configs/.../
# associative_embedding/coco/higherhrnet_w32_coco_512x512.py).
import os as _os
_COCO_ROOT = _os.environ.get('COCO_ROOT', '/data/coco')
_base_ = ['../base/default_runtime.py']

model = dict(
    family='bottomup',
    backbone_type='hrnet',
    backbone_overrides=dict(width=32, stage_modules=(1, 4, 3)),
    head='ae_higher',
    head_overrides=dict(tag_per_joint=True, num_deconv_layers=1,
                        deconv_filters=(32,), deconv_kernels=(4,),
                        num_basic_blocks=4, cat_output=(True,),
                        with_ae_loss=(True, False), final_kernel=1),
    num_joints=17,
    dataset_info='coco',
)
data = dict(
    dataset='coco', family='bottomup',
    input_size=512, output_sizes=(128, 256), base_size=256,
    max_people=30, batch_size=24, num_workers=8,
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
runtime = dict(work_dir='work_dirs/higherhrnet_w32_coco_512x512')

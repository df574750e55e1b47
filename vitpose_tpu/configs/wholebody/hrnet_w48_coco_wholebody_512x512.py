# HRNet + AESimpleHead-W48 associative embedding on COCO-WholeBody (133 kpts)
# at 512x512 (reference: configs/wholebody/2d_kpt_sview_rgb_img/associative_embedding/coco-wholebody/hrnet_w48_coco_wholebody_512x512.py)
import os as _os
_ROOT = _os.environ.get('COCO_ROOT', '/data/coco')
_base_ = ['../base/default_runtime.py']

model = dict(
    family='bottomup',
    backbone_type='hrnet',
    backbone_overrides=dict(width=48, stage_modules=(1, 4, 3)),
    head='ae',
    head_overrides=dict(tag_per_joint=True, deconv_filters=(),
                        deconv_kernels=(), final_kernel=1),
    num_joints=133,
    dataset_info='coco_wholebody',
)
data = dict(
    dataset='coco_wholebody', family='bottomup',
    input_size=512, output_sizes=(128,), base_size=256,
    max_people=30, batch_size=16, num_workers=8,
    test_scale_factor=(1.0,), use_udp=False,
    train=dict(
        ann_file=f'{_ROOT}/annotations/coco_wholebody_train_v1.0.json',
        img_prefix=f'{_ROOT}/train2017/'),
    val=dict(
        ann_file=f'{_ROOT}/annotations/coco_wholebody_val_v1.0.json',
        img_prefix=f'{_ROOT}/val2017/'),
)
target = dict(sigma=2.0)
optimizer = dict(base_lr=1.5e-3, warmup_iters=500, decay_epochs=(200, 260),
                 total_epochs=300)
runtime = dict(work_dir='work_dirs/hrnet_w48_coco_wholebody_512x512')

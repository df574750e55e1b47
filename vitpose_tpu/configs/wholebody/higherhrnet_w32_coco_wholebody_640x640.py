# HigherHRNet-W32 associative embedding on COCO-WholeBody (133 kpts)
# at 640x640 (reference: configs/wholebody/2d_kpt_sview_rgb_img/associative_embedding/coco-wholebody/higherhrnet_w32_coco_wholebody_640x640.py)
import os as _os
_ROOT = _os.environ.get('COCO_ROOT', '/data/coco')
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
    num_joints=133,
    dataset_info='coco_wholebody',
)
data = dict(
    dataset='coco_wholebody', family='bottomup',
    input_size=640, output_sizes=(160, 320), base_size=320,
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
runtime = dict(work_dir='work_dirs/higherhrnet_w32_coco_wholebody_640x640')

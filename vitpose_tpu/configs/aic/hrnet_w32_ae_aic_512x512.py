# hrnet_w32_ae_aic_512x512 (reference: configs/body/2d_kpt_sview_rgb_img/associative_embedding/aic/hrnet_w32_aic_512x512.py)
import os as _os
_ROOT = _os.environ.get('AIC_ROOT', '/data/aic')
_base_ = ['../base/default_runtime.py']

model = dict(
    family='bottomup',
    backbone_type='hrnet',
    backbone_overrides=dict(width=32, stage_modules=(1, 4, 3)),
    head='ae',
    head_overrides=dict(tag_per_joint=True, deconv_filters=(),
                        deconv_kernels=(), final_kernel=1),
    num_joints=14,
    dataset_info='aic',
)
data = dict(
    dataset='aic', family='bottomup',
    input_size=512, output_sizes=(128,), base_size=256,
    max_people=30, batch_size=24, num_workers=8,
    test_scale_factor=(1.0,),
    use_udp=False,
    train=dict(
        ann_file=f'{_ROOT}/annotations/aic_train.json',
        img_prefix=f'{_ROOT}/ai_challenger_keypoint_train_20170902/'
                   'keypoint_train_images_20170902/'),
    val=dict(
        ann_file=f'{_ROOT}/annotations/aic_val.json',
        img_prefix=f'{_ROOT}/ai_challenger_keypoint_validation_20170911/'
                   'keypoint_validation_images_20170911/'),
)
target = dict(sigma=2.0)
optimizer = dict(base_lr=1.5e-3, warmup_iters=500, decay_epochs=(200, 260),
                 total_epochs=300)
runtime = dict(work_dir='work_dirs/hrnet_w32_ae_aic_512x512')

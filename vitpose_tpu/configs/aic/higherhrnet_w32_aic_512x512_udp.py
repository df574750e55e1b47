# higherhrnet_w32_aic_512x512_udp (reference: configs/body/2d_kpt_sview_rgb_img/associative_embedding/aic/higherhrnet_w32_aic_512x512_udp.py)
import os as _os
_ROOT = _os.environ.get('AIC_ROOT', '/data/aic')
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
    num_joints=14,
    dataset_info='aic',
    parser=dict(use_udp=True),
)
data = dict(
    dataset='aic', family='bottomup',
    input_size=512, output_sizes=(128, 256), base_size=256,
    max_people=30, batch_size=24, num_workers=8,
    test_scale_factor=(1.0,),
    use_udp=True,
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
runtime = dict(work_dir='work_dirs/higherhrnet_w32_aic_512x512_udp')

# res152_ae_crowdpose_512x512 (reference: configs/body/2d_kpt_sview_rgb_img/associative_embedding/crowdpose/res152_crowdpose_512x512.py)
import os as _os
_ROOT = _os.environ.get('CROWDPOSE_ROOT', '/data/crowdpose')
_base_ = ['../base/default_runtime.py']

model = dict(
    family='bottomup',
    backbone_type='resnet',
    backbone_overrides=dict(depth=152),
    head='ae',
    head_overrides=dict(tag_per_joint=True,
                        deconv_filters=(256, 256, 256),
                        deconv_kernels=(4, 4, 4), final_kernel=1),
    num_joints=14,
    dataset_info='crowdpose',
)
data = dict(
    dataset='crowdpose', family='bottomup',
    input_size=512, output_sizes=(128,), base_size=256,
    max_people=30, batch_size=24, num_workers=8,
    test_scale_factor=(1.0,),
    use_udp=False,
    train=dict(
        ann_file=f'{_ROOT}/annotations/'
                 'mmpose_crowdpose_trainval.json',
        img_prefix=f'{_ROOT}/images/'),
    val=dict(
        ann_file=f'{_ROOT}/annotations/mmpose_crowdpose_test.json',
        img_prefix=f'{_ROOT}/images/'),
)
target = dict(sigma=2.0)
optimizer = dict(base_lr=1.5e-3, warmup_iters=500, decay_epochs=(200, 260),
                 total_epochs=300)
runtime = dict(work_dir='work_dirs/res152_ae_crowdpose_512x512')

# mobilenetv2_ae_coco_512x512 (reference: configs/body/2d_kpt_sview_rgb_img/associative_embedding/coco/mobilenetv2_coco_512x512.py)
import os as _os
_ROOT = _os.environ.get('COCO_ROOT', '/data/coco')
_base_ = ['../base/default_runtime.py']

model = dict(
    family='bottomup',
    backbone_type='mobilenet_v2',
    backbone_overrides=dict(widen_factor=1.0),
    head='ae',
    head_overrides=dict(tag_per_joint=True,
                        deconv_filters=(256, 256, 256),
                        deconv_kernels=(4, 4, 4), final_kernel=1),
    num_joints=17,
    dataset_info='coco',
)
data = dict(
    dataset='coco', family='bottomup',
    input_size=512, output_sizes=(128,), base_size=256,
    max_people=30, batch_size=24, num_workers=8,
    test_scale_factor=(1.0,),
    use_udp=False,
    train=dict(
        ann_file=f'{_ROOT}/annotations/'
                 'person_keypoints_train2017.json',
        img_prefix=f'{_ROOT}/train2017/'),
    val=dict(
        ann_file=f'{_ROOT}/annotations/person_keypoints_val2017.json',
        img_prefix=f'{_ROOT}/val2017/'),
)
target = dict(sigma=2.0)
optimizer = dict(base_lr=1.5e-3, warmup_iters=500, decay_epochs=(200, 260),
                 total_epochs=300)
runtime = dict(work_dir='work_dirs/mobilenetv2_ae_coco_512x512')

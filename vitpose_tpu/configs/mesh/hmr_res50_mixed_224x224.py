# HMR parametric-mesh estimator with adversarial training (reference:
# configs/body/3d_mesh_sview_rgb_img/hmr/mixed/hmr_res50_mixed_224x224.py).
# smpl='linear' is a deterministic surrogate basis; point it at a baked
# npz (models/mesh.py npz_smpl_fn) when the licensed SMPL model is
# available.
import os as _os
_ROOT = _os.environ.get('MESH_ROOT', '/data/mesh')
_base_ = ['../base/default_runtime.py']

model = dict(
    family='mesh',
    backbone_type='resnet',
    backbone_overrides=dict(depth=50),
    num_iters=3,
    # reference HMR head layout (hmr_head.py:28 npose=24*6): required for
    # tools/test.py on a reference mesh .pth without manual overrides
    pose_rep='rot6d',
    smpl='linear',
)
data = dict(
    dataset='mesh_mix', family='mesh',
    image_size=(224, 224), batch_size=64, num_workers=8,
    train=dict(
        configs=[
            dict(ann_file=f'{_ROOT}/annotations/h36m_train.npz',
                 img_prefix=f'{_ROOT}/h36m/'),
            dict(ann_file=f'{_ROOT}/annotations/coco_2014_train.npz',
                 img_prefix=f'{_ROOT}/coco/'),
        ],
        partition=[0.6, 0.4],
        adv_ann_file=f'{_ROOT}/annotations/cmu_mosh.npz'),
    val=dict(ann_file=f'{_ROOT}/annotations/h36m_valid.npz',
             img_prefix=f'{_ROOT}/h36m/'),
)
optimizer = dict(base_lr=2.5e-4, disc_lr=1e-4, total_epochs=100)
runtime = dict(work_dir='work_dirs/hmr_res50_mixed_224x224',
               save_best='MPJPE', save_best_mode='min')

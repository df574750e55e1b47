# hrnetv2_w18_coco_wholebody_face_256x256_dark: DARK decode variant (reference: configs/face/2d_kpt_sview_rgb_img/topdown_heatmap/coco_wholebody_face/hrnetv2_w18_coco_wholebody_face_256x256_dark.py)
_base_ = ['../face/hrnetv2_w18_coco_wholebody_face_256x256.py']

model = dict(post_process='unbiased', modulate_kernel=11)
target = dict(encoding='MSRA', sigma=2.0, unbiased=True)
runtime = dict(work_dir='work_dirs/hrnetv2_w18_coco_wholebody_face_256x256_dark')

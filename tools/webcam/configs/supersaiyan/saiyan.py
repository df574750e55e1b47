# Super-saiyan app (counterpart of tools/webcam/configs/supersaiyan/
# saiyan.py): spiky hair anchored on the face + optional green-screen
# aura video (set hair_img_path / light_video_path to local assets).
runner = dict(
    name='Super Saiyan',
    camera_id=0,
    camera_fps=20,
    synchronous=True,
    nodes=[
        dict(
            type='DetectorNode',
            name='Detector',
            detector=None,
            input_buffer='_input_',
            output_buffer='det_result'),
        dict(
            type='TopDownPoseEstimatorNode',
            name='Human Pose Estimator',
            model_config='s',
            cls_names=['person'],
            input_buffer='det_result',
            output_buffer='human_pose'),
        dict(
            type='ModelResultBindingNode',
            name='ResultBinder',
            frame_buffer='_frame_',
            result_buffer='human_pose',
            output_buffer='frame'),
        dict(
            type='SaiyanNode',
            name='Saiyan',
            enable_key='s',
            enable=True,
            frame_buffer='frame',
            output_buffer='vis_saiyan'),
        dict(
            type='MonitorNode',
            name='Monitor',
            enable_key='m',
            enable=False,
            frame_buffer='vis_saiyan',
            output_buffer='_display_'),
    ])

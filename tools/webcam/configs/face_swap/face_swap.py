# Face-swap app (counterpart of tools/webcam/configs/face_swap/
# face_swap.py): swaps faces among detected people; 'x' cycles
# NONE -> SHUFFLE -> CLONE.
runner = dict(
    name='Face Swap',
    camera_id=0,
    camera_fps=20,
    synchronous=False,
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
            type='FaceSwapNode',
            name='FaceSwap',
            mode_key='x',
            frame_buffer='frame',
            output_buffer='vis_swap'),
        dict(
            type='MonitorNode',
            name='Monitor',
            enable_key='m',
            enable=False,
            frame_buffer='vis_swap',
            output_buffer='_display_'),
    ])

# Eye effects app (counterpart of tools/webcam/configs/eyes/eyes.py):
# sunglasses + bug-eye, toggled by hot-keys.
runner = dict(
    name='Eye Effects',
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
            type='SunglassesNode',
            name='Sunglasses',
            enable_key='s',
            enable=True,
            frame_buffer='frame',
            output_buffer='vis_sunglasses'),
        dict(
            type='BugEyeNode',
            name='BugEye',
            enable_key='b',
            enable=False,
            frame_buffer='vis_sunglasses',
            output_buffer='vis_bugeye'),
        dict(
            type='NoticeBoardNode',
            name='Helper',
            enable_key='h',
            enable=False,
            frame_buffer='vis_bugeye',
            output_buffer='vis_notice',
            content_lines=[
                'Eye effects!', '', 'Hot-keys:',
                '"s": Sunglasses effect B-)', '"b": Bug-eye effect 0_0',
                '"h": Show help information',
                '"m": Show diagnostic information', '"q": Exit'
            ]),
        dict(
            type='MonitorNode',
            name='Monitor',
            enable_key='m',
            enable=False,
            frame_buffer='vis_notice',
            output_buffer='_display_'),
    ])

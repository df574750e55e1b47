# New-year effects app (counterpart of tools/webcam/configs/newyear/
# new_year.py): hat + firecracker effects.
runner = dict(
    name='New Year',
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
            type='HatNode',
            name='Hat',
            enable_key='t',
            frame_buffer='frame',
            output_buffer='vis_hat'),
        dict(
            type='FirecrackerNode',
            name='Firecracker',
            enable_key='f',
            frame_buffer='vis_hat',
            output_buffer='vis_firecracker'),
        dict(
            type='NoticeBoardNode',
            name='Helper',
            enable_key='h',
            enable=False,
            frame_buffer='vis_firecracker',
            output_buffer='vis_notice',
            content_lines=[
                'Happy New Year!', '', 'Hot-keys:',
                '"t": Hat effect', '"f": Firecracker effect',
                '"h": Show help information', '"q": Exit'
            ]),
        dict(
            type='MonitorNode',
            name='Monitor',
            enable_key='m',
            enable=False,
            frame_buffer='vis_notice',
            output_buffer='_display_'),
    ])

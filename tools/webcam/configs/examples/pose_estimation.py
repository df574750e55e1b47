# Full-feature pose-estimation webcam app (counterpart of the reference
# tools/webcam/configs/examples/pose_estimation.py). The detector slot is
# pluggable: None emits a whole-frame person box (reference uses an mmdet
# ssdlite model); pass a callable via cfg-options or edit here to use one.
runner = dict(
    name='Pose Estimation',
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
            model_checkpoint=None,
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
            type='PoseVisualizerNode',
            name='Visualizer',
            enable_key='v',
            frame_buffer='frame',
            output_buffer='vis'),
        dict(
            type='SunglassesNode',
            name='Sunglasses',
            enable_key='s',
            enable=False,
            frame_buffer='vis',
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
            enable=True,
            frame_buffer='vis_bugeye',
            output_buffer='vis_notice',
            content_lines=[
                'This is a demo for pose visualization and simple image '
                'effects. Have fun!', '', 'Hot-keys:',
                '"v": Pose estimation result visualization',
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
            output_buffer='display'),
        dict(
            type='RecorderNode',
            name='Recorder',
            out_video_file='record.mp4',
            frame_buffer='display',
            output_buffer='_display_'),
    ])

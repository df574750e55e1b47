# Valentine-magic app (counterpart of tools/webcam/configs/
# valentinemagic/valentinemagic.py): hearts triggered by hand-heart /
# blow-kiss gestures. Use a wholebody model for hand-gesture detection.
runner = dict(
    name='Valentine Magic',
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
            model_config=dict(variant='s', dataset='coco_wholebody',
                              out_channels=133),
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
            type='ValentineMagicNode',
            name='Valentine',
            frame_buffer='frame',
            output_buffer='vis_heart'),
        dict(
            type='MonitorNode',
            name='Monitor',
            enable_key='m',
            enable=False,
            frame_buffer='vis_heart',
            output_buffer='_display_'),
    ])

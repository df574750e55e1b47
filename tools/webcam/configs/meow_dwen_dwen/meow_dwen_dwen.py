# Meow-Dwen-Dwen app (counterpart of tools/webcam/configs/
# meow_dwen_dwen/meow_dwen_dwen.py): blend the captured face into a
# mascot template; 'x' cycles templates. Pass labelbee-style templates
# ({'image_path', 'keypoints', 'mask_polygon'}) for custom artwork.
runner = dict(
    name='Meow Dwen Dwen',
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
            name='Pose Estimator',
            model_config='s',
            input_buffer='det_result',
            output_buffer='pose'),
        dict(
            type='ModelResultBindingNode',
            name='ResultBinder',
            frame_buffer='_frame_',
            result_buffer='pose',
            output_buffer='frame'),
        dict(
            type='XDwenDwenNode',
            name='XDwenDwen',
            mode_key='x',
            frame_buffer='frame',
            output_buffer='_display_'),
    ])

# Background-replacement app (counterpart of tools/webcam/configs/
# background/background.py). Requires a detector that produces instance
# masks for clean matting; falls back to box-shaped cutouts otherwise.
runner = dict(
    name='Background Matting',
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
            type='ModelResultBindingNode',
            name='ResultBinder',
            frame_buffer='_frame_',
            result_buffer='det_result',
            output_buffer='frame'),
        dict(
            type='BackgroundNode',
            name='Background',
            enable_key='b',
            enable=True,
            frame_buffer='frame',
            output_buffer='vis_bg',
            cls_names=['person']),
        dict(
            type='MonitorNode',
            name='Monitor',
            enable_key='m',
            enable=False,
            frame_buffer='vis_bg',
            output_buffer='_display_'),
    ])

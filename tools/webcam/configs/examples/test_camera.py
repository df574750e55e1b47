# Minimal camera check (counterpart of the reference
# tools/webcam/configs/examples/test_camera.py): monitor overlay only.
runner = dict(
    name='Test Webcam',
    camera_id=0,
    camera_fps=30,
    nodes=[
        dict(
            type='MonitorNode',
            name='Monitor',
            enable_key='m',
            enable=True,
            frame_buffer='_frame_',
            output_buffer='_display_'),
    ])

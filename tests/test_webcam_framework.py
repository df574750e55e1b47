"""The full webcam node-graph framework (vitpose_tpu/webcam/): buffers,
events, messages, node threading, helper/effect nodes, and the
config-driven runner — counterpart of the reference
tools/webcam/webcam_apis (webcam_runner.py, nodes/, utils/)."""
import os
import threading
import time

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from vitpose_tpu.data.dataset_info import DatasetInfo
from vitpose_tpu.webcam import (NODES, Buffer, BufferManager, EventManager,
                                FrameMessage, VideoEndingMessage,
                                WebcamRunner)
from vitpose_tpu.webcam.node import Node


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def test_buffer_put_force_drops_oldest():
    buf = Buffer(maxsize=2)
    for i in range(4):
        buf.put_force(i)
    assert buf.get() == 2 and buf.get() == 3


def test_buffer_manager_sub_manager_is_a_view():
    mgr = BufferManager()
    mgr.register_buffer('a', 1)
    mgr.register_buffer('b', 1)
    sub = mgr.get_sub_manager(['a'])
    sub.put('a', 'x')
    assert mgr.get('a') == 'x'
    with pytest.raises(ValueError):
        sub.put('b', 'y')
    with pytest.raises(ValueError):
        mgr.register_buffer('a', 1)   # duplicate registration


def test_event_manager_keyboard_namespace():
    ev = EventManager()
    ev.register_event('s', is_keyboard=True)
    ev.set('s', is_keyboard=True)
    # keyboard events live in their own namespace (reference event.py:47)
    assert not ev.is_set('s')
    assert ev.is_set('s', is_keyboard=True)
    # int keys alias their chr form
    assert ev.is_set(ord('s'), is_keyboard=True)
    with ev.wait_and_handle('s', is_keyboard=True, timeout=0.1) as fired:
        assert fired
    assert not ev.is_set('s', is_keyboard=True)


def test_frame_message_tagged_results_and_route_merge():
    msg = FrameMessage(np.zeros((4, 4, 3), np.uint8))
    msg.add_pose_result({'preds': [1]}, tag='human')
    msg.add_pose_result({'preds': [2]}, tag='animal')
    assert len(msg.get_pose_results()) == 2
    assert msg.get_pose_results(tag='animal') == [{'preds': [2]}]
    assert msg.get_detection_results() is None

    msg.update_route_info(node_name='a', node_type='A',
                          info={'timestamp': 2.0})
    other = FrameMessage(np.zeros((4, 4, 3), np.uint8))
    other.update_route_info(node_name='b', node_type='B',
                            info={'timestamp': 1.0})
    msg.merge_route_info(other.get_route_info())
    assert [e['node'] for e in msg.get_route_info()] == ['a', 'b']

    full = msg.get_full_results()
    msg2 = FrameMessage(np.zeros((4, 4, 3), np.uint8))
    msg2.set_full_results(full)
    assert len(msg2.get_pose_results()) == 2


def test_node_registry_build_and_unknown():
    cfg = dict(type='NoticeBoardNode', name='n', frame_buffer='f',
               output_buffer='o', content_lines=['hi'])
    node = NODES.build(cfg)
    assert node.name == 'n'
    with pytest.raises(KeyError):
        NODES.build(dict(type='NoSuchNode'))


def test_enable_key_requires_bypass():
    class NoBypass(Node):
        def process(self, input_msgs):
            return None

    with pytest.raises(NotImplementedError):
        NoBypass(name='x', enable_key='z')


# ---------------------------------------------------------------------------
# fixtures for node-level tests
# ---------------------------------------------------------------------------


def _coco_info():
    return DatasetInfo.load('coco')


def _person_kpts(cx=48, cy=40, eye_dx=8):
    """A plausible 17-kpt COCO person around (cx, cy)."""
    kpts = np.zeros((17, 3), np.float32)
    kpts[:, 2] = 1.0
    kpts[0] = [cx, cy, 1]                       # nose
    kpts[1] = [cx + eye_dx / 2, cy - 6, 1]      # left eye
    kpts[2] = [cx - eye_dx / 2, cy - 6, 1]      # right eye
    kpts[3] = [cx + eye_dx, cy - 5, 1]
    kpts[4] = [cx - eye_dx, cy - 5, 1]
    kpts[5] = [cx + 14, cy + 14, 1]             # left shoulder
    kpts[6] = [cx - 14, cy + 14, 1]             # right shoulder
    kpts[7] = [cx + 18, cy + 30, 1]
    kpts[8] = [cx - 18, cy + 30, 1]
    kpts[9] = [cx + 20, cy + 44, 1]             # left wrist
    kpts[10] = [cx - 20, cy + 44, 1]            # right wrist
    for j in range(11, 17):
        kpts[j] = [cx + (j % 2 * 2 - 1) * 8, cy + 50 + 6 * (j - 11) // 2, 1]
    return kpts


def _pose_frame_msg(n_persons=1, h=128, w=96):
    # non-uniform image so warping effects (bug-eye) are observable
    gx = np.linspace(40, 200, w, dtype=np.uint8)
    gy = np.linspace(40, 200, h, dtype=np.uint8)
    img = np.stack([np.tile(gx, (h, 1)), np.tile(gy[:, None], (1, w)),
                    np.full((h, w), 120, np.uint8)], axis=-1)
    msg = FrameMessage(img)
    preds = []
    for i in range(n_persons):
        kpts = _person_kpts(cx=(i + 1) * w // (n_persons + 1))
        preds.append({'keypoints': kpts,
                      'bbox': np.array([5, 5, w - 5, h - 5, 0.9],
                                       np.float32),
                      'track_id': i, 'label': 'person'})
    msg.add_pose_result({'preds': preds, 'dataset_info': _coco_info()},
                        tag='pose')
    msg.add_detection_result(
        {'preds': [{'cls_id': 0, 'label': 'person', 'mask': None,
                    'bbox': np.array([5, 5, w - 5, h - 5, 0.9],
                                     np.float32)}]}, tag='det')
    return msg


# ---------------------------------------------------------------------------
# effect nodes: draw() changes the image, preserves dtype/shape
# ---------------------------------------------------------------------------


@pytest.mark.parametrize('node_cfg', [
    dict(type='PoseVisualizerNode', name='vis', frame_buffer='f',
         output_buffer='o'),
    dict(type='SunglassesNode', name='sg', frame_buffer='f',
         output_buffer='o'),
    dict(type='BugEyeNode', name='be', frame_buffer='f', output_buffer='o'),
    dict(type='MoustacheNode', name='mo', frame_buffer='f',
         output_buffer='o'),
    dict(type='HatNode', name='hat', frame_buffer='f', output_buffer='o'),
    dict(type='FirecrackerNode', name='fc', frame_buffer='f',
         output_buffer='o'),
    dict(type='NoticeBoardNode', name='nb', frame_buffer='f',
         output_buffer='o'),
    dict(type='SaiyanNode', name='sai', frame_buffer='f',
         output_buffer='o'),
    dict(type='BackgroundNode', name='bg', frame_buffer='f',
         output_buffer='o'),
    dict(type='SpriteNode', name='sp', frame_buffer='f', output_buffer='o'),
])
def test_effect_nodes_draw(node_cfg):
    node = NODES.build(node_cfg)
    msg = _pose_frame_msg()
    before = msg.get_image().copy()
    out = node.draw(msg)
    assert out.shape == before.shape and out.dtype == np.uint8
    assert np.any(out != before), f'{node_cfg["type"]} drew nothing'


def test_effect_nodes_no_pose_is_noop():
    node = NODES.build(dict(type='SunglassesNode', name='sg',
                            frame_buffer='f', output_buffer='o'))
    img = np.full((64, 48, 3), 50, np.uint8)
    out = node.draw(FrameMessage(img.copy()))
    np.testing.assert_array_equal(out, img)


def test_faceswap_swaps_between_two_people():
    node = NODES.build(dict(type='FaceSwapNode', name='fs',
                            frame_buffer='f', output_buffer='o',
                            mode_key='x'))
    msg = _pose_frame_msg(n_persons=2, h=160, w=192)
    # give the two faces distinct colors so a swap is observable
    img = msg.get_image()
    img[20:60, 40:90] = (0, 0, 200)
    img[20:60, 100:150] = (0, 200, 0)
    out = node.draw(msg)
    assert out.shape == img.shape
    assert np.any(out != img)
    # mode cycling: SHUFFLE -> CLONE -> NONE
    node.switch_mode()
    node.switch_mode()
    from vitpose_tpu.webcam.effect_nodes import FaceSwapMode
    assert node.mode == FaceSwapMode.NONE
    out2 = node.draw(msg)
    np.testing.assert_array_equal(out2, msg.get_image())


def test_valentine_heart_on_wrist_gesture():
    node = NODES.build(dict(type='ValentineMagicNode', name='vm',
                            frame_buffer='f', output_buffer='o'))
    msg = _pose_frame_msg()
    kpts = msg.get_pose_results()[0]['preds'][0]['keypoints']
    # both wrists together above the nose -> body-only heart trigger
    kpts[9] = [48, 20, 1.0]
    kpts[10] = [50, 20, 1.0]
    before = msg.get_image().copy()
    out = None
    for _ in range(3):   # heart grows over frames
        out = node.draw(msg)
    assert np.any(out != before)


def test_xdwendwen_outputs_template_canvas():
    node = NODES.build(dict(type='XDwenDwenNode', name='xd',
                            frame_buffer='f', output_buffer='o',
                            mode_key='x', out_shape=(120, 120)))
    out = node.draw(_pose_frame_msg())
    assert out.shape == (120, 120, 3)
    node.switch_mode()   # single default template: wraps around
    assert node.mode_index == 0


def test_monitor_node_overlays_route_info():
    node = NODES.build(dict(type='MonitorNode', name='mon',
                            frame_buffer='f', output_buffer='o',
                            enable=True))
    msg = _pose_frame_msg()
    msg.update_route_info(node_name='up', node_type='Up',
                          info={'fps': 12.5})
    before = msg.get_image().copy()
    out_msg = node.process({'frame': msg})
    assert np.any(out_msg.get_image() != before)


def test_model_result_binding_async_and_sync():
    from vitpose_tpu.webcam.helper_nodes import ModelResultBindingNode

    class _FakeRunner:
        def __init__(self, synchronous):
            self.synchronous = synchronous
            self.buffer_manager = BufferManager()
            for b in ('r', 'f', 'o'):
                self.buffer_manager.register_buffer(b, 1)
            self.event_manager = EventManager()

    # async: frame goes out carrying the latest result
    node = ModelResultBindingNode('bind', frame_buffer='f',
                                  result_buffer='r', output_buffer='o')
    node.set_runner(_FakeRunner(synchronous=False))
    assert [b.essential for b in node._input_buffers] == [False, True]
    result_msg = _pose_frame_msg()
    frame_msg = FrameMessage(np.zeros((8, 8, 3), np.uint8))
    out = node.process({'result': result_msg, 'frame': frame_msg})
    assert out is frame_msg
    assert len(out.get_pose_results()) == 1
    # next frame without a fresh result still gets the cached one
    frame2 = FrameMessage(np.zeros((8, 8, 3), np.uint8))
    out2 = node.process({'result': None, 'frame': frame2})
    assert len(out2.get_pose_results()) == 1

    # sync: the result's own frame goes out
    node_s = ModelResultBindingNode('bind', frame_buffer='f',
                                    result_buffer='r', output_buffer='o')
    node_s.set_runner(_FakeRunner(synchronous=True))
    assert [b.essential for b in node_s._input_buffers] == [True, False]
    out_s = node_s.process({'result': result_msg, 'frame': None})
    assert out_s is result_msg


# ---------------------------------------------------------------------------
# runner integration (headless)
# ---------------------------------------------------------------------------


def _write_frames(tmpdir, n=8, h=64, w=48):
    os.makedirs(str(tmpdir), exist_ok=True)
    for i in range(n):
        img = np.full((h, w, 3), 30 + 10 * i, np.uint8)
        cv2.imwrite(os.path.join(str(tmpdir), f'{i:03d}.jpg'), img)
    return str(tmpdir)


class _StubPoseNode(Node):
    """Stands in for TopDownPoseEstimatorNode: tags a fixed pose result."""

    def __init__(self, name, input_buffer, output_buffer):
        super().__init__(name=name, enable=True)
        self.register_input_buffer(input_buffer, 'input', essential=True)
        self.register_output_buffer(output_buffer)

    def process(self, input_msgs):
        msg = input_msgs['input']
        h, w = msg.get_image().shape[:2]
        msg.add_pose_result(
            {'preds': [{'keypoints': _person_kpts(cx=w // 2, cy=h // 3),
                        'bbox': np.array([2, 2, w - 2, h - 2, 0.9],
                                         np.float32)}],
             'dataset_info': _coco_info()}, tag=self.name)
        return msg


def test_runner_headless_graph(tmp_path):
    src = _write_frames(tmp_path / 'imgs', n=30)
    out_video = str(tmp_path / 'rec.mp4')
    displayed = []

    runner = WebcamRunner(
        name='test app',
        camera_id=src,
        camera_fps=120,
        show=False,
        max_frames=6,
        on_display=lambda img, msg: displayed.append(img.shape),
        nodes=[
            _StubPoseNode('pose', input_buffer='_input_',
                          output_buffer='pose'),
            dict(type='ModelResultBindingNode', name='binder',
                 frame_buffer='_frame_', result_buffer='pose',
                 output_buffer='frame'),
            dict(type='PoseVisualizerNode', name='vis', enable_key='v',
                 frame_buffer='frame', output_buffer='vis'),
            dict(type='SunglassesNode', name='sunglasses', enable_key='s',
                 enable=False, frame_buffer='vis', output_buffer='vis2'),
            dict(type='MonitorNode', name='monitor', enable_key='m',
                 enable=True, frame_buffer='vis2', output_buffer='disp'),
            dict(type='RecorderNode', name='recorder',
                 out_video_file=out_video, frame_buffer='disp',
                 output_buffer='_display_'),
        ])
    n = runner.run()
    assert n == 6 and len(displayed) == 6
    assert displayed[0] == (64, 48, 3)
    assert os.path.exists(out_video) and os.path.getsize(out_video) > 0
    # user buffers were auto-registered
    for b in ('pose', 'frame', 'vis', 'vis2', 'disp'):
        assert b in runner.buffer_manager


def test_runner_video_ending_terminates():
    """A finite source ends the app via VideoEndingMessage propagation
    (reference node.py:330 + webcam_runner.py:199)."""
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        _write_frames(d, n=3)
        runner = WebcamRunner(
            camera_id=d, camera_fps=200, show=False,
            nodes=[dict(type='MonitorNode', name='mon', enable=True,
                        frame_buffer='_frame_', output_buffer='_display_')])
        t0 = time.time()
        n = runner.run()
        assert n <= 3
        assert time.time() - t0 < 30
        assert runner.event_manager.is_set('_exit_')


def test_runner_hotkey_toggles_node():
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        _write_frames(d, n=200, h=32, w=32)
        notice = NODES.build(dict(
            type='NoticeBoardNode', name='notice', enable_key='h',
            enable=False, frame_buffer='_frame_',
            output_buffer='_display_'))
        runner = WebcamRunner(camera_id=d, camera_fps=500, show=False,
                              max_frames=150, nodes=[notice])

        def poke():
            time.sleep(0.3)
            runner.inject_key('h')

        th = threading.Thread(target=poke)
        th.start()
        runner.run()
        th.join()
        assert notice._enabled, 'hot-key did not toggle the node'


def test_runner_synchronous_mode(tmp_path):
    img_file = str(tmp_path / 'cam.jpg')
    cv2.imwrite(img_file, np.full((48, 64, 3), 90, np.uint8))
    runner = WebcamRunner(
        camera_id=img_file,     # ImageCapture: endless constant frames
        synchronous=True, show=False, max_frames=4,
        nodes=[
            _StubPoseNode('pose', input_buffer='_input_',
                          output_buffer='pose'),
            dict(type='ModelResultBindingNode', name='binder',
                 frame_buffer='_frame_', result_buffer='pose',
                 output_buffer='frame'),
            dict(type='PoseVisualizerNode', name='vis',
                 frame_buffer='frame', output_buffer='_display_'),
        ])
    assert runner.run() == 4


def test_detector_node_whole_frame_fallback():
    from vitpose_tpu.webcam.model_nodes import DetectorNode
    node = DetectorNode('det', input_buffer='_input_',
                        output_buffer='o', detector=None)
    msg = FrameMessage(np.zeros((40, 30, 3), np.uint8))
    out = node.process({'input': msg})
    preds = out.get_detection_results(tag='det')[0]['preds']
    assert preds[0]['label'] == 'person'
    np.testing.assert_allclose(preds[0]['bbox'][:4], [0, 0, 30, 40])


def test_pose_estimator_node_end_to_end(tmp_path):
    """The real TopDownPoseEstimatorNode (tiny ViT) inside a headless
    runner: detector -> pose -> binder -> visualizer."""
    from vitpose_tpu.models.topdown import TopDownConfig
    from vitpose_tpu.models.vit import ViTConfig
    cfg = TopDownConfig(
        backbone=ViTConfig(img_size=(64, 48), embed_dim=32, depth=2,
                           num_heads=4),
        out_channels=17)
    from vitpose_tpu.webcam.model_nodes import (DetectorNode,
                                                TopDownPoseEstimatorNode)
    det_node = DetectorNode('det', input_buffer='_input_',
                            output_buffer='det', detector=None)
    pose_node = TopDownPoseEstimatorNode(
        'pose', model_config=cfg, cls_names=['person'],
        input_buffer='det', output_buffer='pose')
    # warm the jit outside the frame loop so the synchronous runner below
    # isn't timing a compile
    warm = FrameMessage(np.zeros((64, 48, 3), np.uint8))
    pose_node.process({'input': det_node.process({'input': warm})})

    img_file = str(tmp_path / 'cam.jpg')
    cv2.imwrite(img_file, np.full((64, 48, 3), 90, np.uint8))
    shown = []
    runner = WebcamRunner(
        camera_id=img_file,   # endless constant source
        synchronous=True, show=False, max_frames=3,
        on_display=lambda img, msg: shown.append(msg),
        nodes=[
            det_node, pose_node,
            dict(type='ModelResultBindingNode', name='binder',
                 frame_buffer='_frame_', result_buffer='pose',
                 output_buffer='frame'),
            dict(type='PoseVisualizerNode', name='vis',
                 frame_buffer='frame', output_buffer='_display_'),
        ])
    assert runner.run() == 3
    poses = [m.get_pose_results() for m in shown if m.get_pose_results()]
    assert poses, 'no pose results reached the display chain'
    preds = poses[-1][0]['preds']
    assert preds and preds[0]['keypoints'].shape == (17, 3)
    assert 'track_id' in preds[0]


def test_webcam_app_configs_load_and_reference_known_nodes():
    """Every shipped app config builds against the node registry
    (name/signature errors surface here, not at demo time)."""
    import glob
    import inspect
    from vitpose_tpu.utils.config import load_config
    cfg_dir = os.path.join(os.path.dirname(__file__), '..', 'tools',
                           'webcam', 'configs')
    paths = glob.glob(os.path.join(cfg_dir, '*', '*.py'))
    assert len(paths) >= 8
    for path in paths:
        cfg = load_config(path)['runner']
        assert cfg['nodes'], path
        for node_cfg in cfg['nodes']:
            cls = NODES.get(node_cfg['type'])
            sig = inspect.signature(cls.__init__)
            for k in node_cfg:
                if k == 'type':
                    continue
                assert k in sig.parameters, \
                    f'{path}: {node_cfg["type"]} has no arg {k!r}'

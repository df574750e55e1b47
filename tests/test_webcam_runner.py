"""Webcam runners: synchronous node chain + the async buffered runner
(reference tools/webcam/webcam_apis/webcam_runner.py semantics: display
keeps the source rate, inference consumes only the latest frame)."""
import time

import numpy as np


class _CountNode:
    name = 'count'

    def __init__(self, delay=0.0, key='n'):
        self.delay = delay
        self.key = key
        self.name = f'count_{key}'
        self.count = 0

    def process(self, msg):
        if self.delay:
            time.sleep(self.delay)
        self.count += 1
        msg[self.key] = self.count
        return msg


def _frames(n, h=32, w=32):
    return [np.full((h, w, 3), i, np.uint8) for i in range(n)]


def test_sync_runner_processes_every_frame():
    from vitpose_tpu.api.webcam import WebcamRunner
    node = _CountNode()
    r = WebcamRunner(iter(_frames(5)), [node])
    assert r.run() == 5
    assert node.count == 5


def test_latest_buffer_overwrites():
    from vitpose_tpu.api.webcam import LatestBuffer
    b = LatestBuffer()
    b.put(1)
    b.put(2)
    assert b.get(timeout=0.1) == 2      # old item dropped
    assert b.get(timeout=0.05) is None  # empty -> timeout


def test_async_runner_display_keeps_source_rate():
    from vitpose_tpu.api.webcam import AsyncWebcamRunner
    slow = _CountNode(delay=0.08, key='inferred')
    disp = _CountNode(key='shown')
    frames = _frames(12)

    def source():
        for f in frames:
            time.sleep(0.01)
            yield f

    r = AsyncWebcamRunner(source(), [slow], [disp])
    shown = r.run()
    # every source frame was displayed ...
    assert shown == 12 and disp.count == 12
    # ... while the slow model node ran on a strict subset (frames dropped
    # by the latest-wins buffer rather than queued)
    assert 1 <= r.inference_count < 12


def test_async_runner_propagates_results_to_display():
    from vitpose_tpu.api.webcam import AsyncWebcamRunner

    class Tagger(_CountNode):
        name = 'tagger'

        def process(self, msg):
            msg = super().process(msg)
            msg['pose_results'] = [{'id': msg['frame_id']}]
            return msg

    seen = []

    class Capture:
        name = 'capture'

        def process(self, msg):
            seen.append(msg.get('pose_results'))
            return msg

    def source():
        for f in _frames(10):
            time.sleep(0.02)
            yield f

    r = AsyncWebcamRunner(source(), [Tagger()], [Capture()])
    r.run()
    # once inference completes at least once, later frames carry results
    assert any(s for s in seen)
    tail = [s for s in seen[-3:]]
    assert all(tail), 'latest results should reach the display loop'

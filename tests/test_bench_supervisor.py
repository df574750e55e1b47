"""bench.py supervisor: per-phase deadlines must survive a child that
hangs inside a GIL-holding C call (the round-4 failure mode — a watchdog
THREAD in the same process provably cannot; VERDICT r4 weak #1).

These tests drive bench.supervise / bench.result_from_events with
synthetic non-jax children, so they validate exactly the machinery that
stands between a tunnel hang and a silent driver record.
"""
import json
import os
import subprocess
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
import bench  # noqa: E402  (repo-root bench.py)


def _write_child(tmp_path, body):
    p = tmp_path / 'child.py'
    p.write_text(
        'import json, os, sys, time\n'
        'EV = os.environ["BENCH_EVENTS"]\n'
        'def emit(**kw):\n'
        '    with open(EV, "a") as f:\n'
        '        f.write(json.dumps(kw) + "\\n")\n'
        + body)
    return [sys.executable, str(p)]


def _env(tmp_path):
    return dict(os.environ, BENCH_EVENTS=str(tmp_path / 'ev.jsonl'))


def test_hanging_child_is_killed_and_partial_emitted(tmp_path):
    # Child enters a phase then sleeps forever — stand-in for a blocked C
    # call. time.sleep releases the GIL, but the parent-side kill works
    # identically for GIL-holding hangs: SIGKILL needs no cooperation.
    cmd = _write_child(tmp_path, (
        'emit(event="phase", phase="device-contact")\n'
        'time.sleep(600)\n'))
    t0 = time.time()
    events, status = bench.supervise(
        cmd, str(tmp_path / 'ev.jsonl'), time.time() + 300,
        env=_env(tmp_path),
        phase_deadlines={'spawn': 20.0, 'device-contact': 1.5},
        poll_s=0.1)
    assert status == 'killed:device-contact'
    assert time.time() - t0 < 30  # killed at the phase deadline, not later
    res = bench.result_from_events(events, status)
    assert res['value'] == 0.0 and res['partial'] is True
    assert 'device-contact' in res['note']


def test_child_hanging_before_first_event_hits_spawn_deadline(tmp_path):
    cmd = _write_child(tmp_path, 'time.sleep(600)\n')
    events, status = bench.supervise(
        cmd, str(tmp_path / 'ev.jsonl'), time.time() + 300,
        env=_env(tmp_path), phase_deadlines={'spawn': 2.0}, poll_s=0.1)
    assert status == 'killed:spawn'
    assert bench.result_from_events(events, status)['value'] == 0.0


def test_completed_iters_survive_a_later_hang(tmp_path):
    # Two timed dispatches complete, then the tunnel dies: the partial
    # result must carry the measured rate (1000 imgs / 0.5 s = 2000/s),
    # not zero. This is the exact record rounds 3/4 failed to produce.
    cmd = _write_child(tmp_path, (
        'emit(event="meta", metric="m")\n'
        'emit(event="phase", phase="compile+warmup")\n'
        'emit(event="warmup", dt=2.0, imgs=1000)\n'
        'emit(event="phase", phase="iter-1/5")\n'
        'emit(event="iter", dt=0.5, imgs=1000)\n'
        'emit(event="iter", dt=0.4, imgs=1000)\n'
        'time.sleep(600)\n'))
    events, status = bench.supervise(
        cmd, str(tmp_path / 'ev.jsonl'), time.time() + 300,
        env=_env(tmp_path), phase_deadlines={'spawn': 20.0},
        iter_deadline=1.5, poll_s=0.1)
    assert status == 'killed:iter-1/5'
    res = bench.result_from_events(events, status)
    assert res['partial'] is True and res['completed_iters'] == 2
    # median of [2000, 2500]
    assert res['value'] == pytest.approx(2500.0) or \
        res['value'] == pytest.approx(2000.0)
    assert res['metric'] == 'm'


def test_warmup_only_fallback(tmp_path):
    events = [{'event': 'phase', 'phase': 'compile+warmup'},
              {'event': 'warmup', 'dt': 4.0, 'imgs': 4096}]
    res = bench.result_from_events(events, 'killed:iter-1/5')
    assert res['value'] == pytest.approx(1024.0)
    assert res['partial'] is True and 'lower bound' in res['note']


def test_clean_run_is_not_partial(tmp_path):
    cmd = _write_child(tmp_path, (
        'emit(event="meta", metric="clean")\n'
        'emit(event="phase", phase="compile+warmup")\n'
        'emit(event="warmup", dt=2.0, imgs=1000)\n'
        'for _ in range(3): emit(event="iter", dt=0.5, imgs=1000)\n'
        'emit(event="done")\n'))
    events, status = bench.supervise(
        cmd, str(tmp_path / 'ev.jsonl'), time.time() + 300,
        env=_env(tmp_path), poll_s=0.1)
    assert status == 'done'
    res = bench.result_from_events(events, status)
    assert res == {'metric': 'clean', 'value': 2000.0,
                   'unit': 'imgs/sec/chip',
                   'vs_baseline': round(2000.0 / 944.0, 4)}


def test_torn_final_line_is_tolerated(tmp_path):
    # SIGKILL can tear the last write; the reader must not crash
    ev = tmp_path / 'ev.jsonl'
    ev.write_text('{"event": "iter", "dt": 0.5, "imgs": 1000}\n'
                  '{"event": "iter", "d')
    events = bench._read_events(str(ev))
    assert len(events) == 1
    res = bench.result_from_events(events, 'killed:iter-2/5')
    assert res['value'] == pytest.approx(2000.0)


def test_supervisor_retry_path_end_to_end(tmp_path):
    # Full bench.py entry with a child stub that hangs on attempt 1 and
    # succeeds on attempt 2 — asserts the retry + single-JSON-line
    # contract the driver depends on. The stub replaces main_child via
    # BENCH_TEST_CHILD_BODY, keeping jax out of the test.
    stub = tmp_path / 'stub_state'
    runner = tmp_path / 'run.py'
    runner.write_text(f'''
import json, os, sys, time
sys.path.insert(0, {os.path.dirname(os.path.dirname(__file__))!r})
import bench

def fake_child():
    ew = bench.EventWriter(bench.EVENTS_PATH)
    state = {str(stub)!r}
    if not os.path.exists(state):
        open(state, "w").write("1")
        ew.phase("device-contact")
        time.sleep(600)
    ew.emit(event="meta", metric="retry-metric")
    ew.phase("compile+warmup")
    ew.emit(event="warmup", dt=1.0, imgs=944)
    ew.emit(event="iter", dt=1.0, imgs=944)
    ew.emit(event="iter", dt=1.0, imgs=944)
    ew.emit(event="done")

if os.environ.get("BENCH_CHILD") == "1":
    fake_child()
else:
    bench.PHASE_DEADLINES = dict(bench.PHASE_DEADLINES,
                                 **{{"device-contact": 2.0}})
    bench.main_supervisor()
''')
    env = dict(os.environ, BENCH_EVENTS=str(tmp_path / 'ev.jsonl'),
               BENCH_WATCHDOG_S='300',
               BENCH_CHILD_SCRIPT=str(runner))
    env.pop('BENCH_CHILD', None)
    out = subprocess.run(
        [sys.executable, str(runner)], env=env, capture_output=True,
        text=True, timeout=120)
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, out.stdout + out.stderr
    res = json.loads(lines[0])
    assert res['metric'] == 'retry-metric'
    assert res['value'] == pytest.approx(944.0)
    assert res['vs_baseline'] == pytest.approx(1.0)
    assert 'partial' not in res  # retry completed cleanly

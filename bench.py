"""Benchmark: end-to-end ViTPose-B 256x192 inference throughput per chip.

Headline metric: sustained throughput of the full deployed single-forward
path — uint8 input, imagenet normalization (folded into the patch-embed
conv), ViT-B forward (bf16, blocked Pallas attention, tanh GELU), classic
deconv head, and on-device UDP decode to keypoints — at batch 256 on one
TPU chip, with GROUP batches processed per dispatch (lax.scan) the way a
deployed serving loop keeps the device fed. This matches the reference's
A100 TensorRT measurement conditions (single forward, no flip test;
arXiv:2204.12484 throughput figure, ~944 img/s for ViTPose-B):
vs_baseline = ours / 944.

Serving-time math notes (both also standard in TensorRT deployments):
  * GELU uses the tanh approximation (erf GELU costs ~14% end-to-end on
    v5e; TensorRT's GELU kernels use the same tanh form).
  * The uint8 /255 + imagenet mean/std normalization is folded into the
    patch-embed convolution weights (exact algebraic rewrite).

Resilience (round 5): the sandbox's remote-execution tunnel can stall a
single C call indefinitely while HOLDING THE GIL (observed live in round
4: jax backend init blocked ~135 s; a same-process watchdog thread cannot
wake during such a hang, which is why rounds 3/4 recorded no number).
This script is therefore a SUPERVISOR + CHILD pair:

  * The parent (this process, default entry) forks a child
    (`BENCH_CHILD=1 python bench.py`) in its own process group. The child
    does all jax work and appends every phase transition and every
    completed timed dispatch to an events file (BENCH_partial.jsonl).
  * The parent never touches jax. It polls the events file and enforces a
    PER-PHASE deadline (table below); a child stuck in any phase — even
    inside a GIL-holding C call — is SIGKILLed from outside, which no
    hang can defeat.
  * Model init runs on the host CPU backend and the params are
    device_put once, so the first device contact is an explicit tiny
    transfer with its own generous deadline (the phase that ate the
    round-4 driver run was a jitted init as first device contact).
  * If the first attempt is killed before any timed dispatch completed,
    the parent retries ONCE with a smaller measurement (GROUP=4,
    ITERS=2) inside the remaining global budget — tunnel hangs are
    transient, and the compile cache makes the retry cheap.
  * Whatever the events file holds at the end (iters > warmup > nothing)
    becomes the single stdout JSON line. Exit code is always 0.

Env knobs: BENCH_ITERS, BENCH_GROUP, BENCH_WATCHDOG_S (global budget,
default 420 s), BENCH_INT8, BENCH_INT8_QKV, BENCH_INT8_SKIP (keep
first/last K blocks bf16 — selective quantization, PERF.md sweep),
BENCH_NO_SUPERVISE=1 (run the measurement inline, for debugging).

Prints ONE json line on stdout: {"metric", "value", "unit", "vs_baseline"}
(+ "partial": true if measurement was cut short).
"""
import json
import os
import signal
import subprocess
import sys
import time

A100_BASELINE_IMGS_PER_SEC = 944.0
BATCH = 256
GROUP = int(os.environ.get('BENCH_GROUP', '16'))  # batches per dispatch
WARMUP = 1                      # (amortizes host/tunnel latency)
ITERS = int(os.environ.get('BENCH_ITERS', '5'))
GLOBAL_BUDGET_S = float(os.environ.get('BENCH_WATCHDOG_S', '420'))
EVENTS_PATH = os.environ.get(
    'BENCH_EVENTS', os.path.join(os.path.dirname(__file__) or '.',
                                 'BENCH_partial.jsonl'))

# Per-phase deadlines (seconds): how long the child may sit in each phase
# before the parent kills it. 'device-contact' carries the big budget —
# that is where the cold-tunnel hang lands (measured 135 s in round 4).
PHASE_DEADLINES = {
    'spawn': 60.0,            # python startup, before the first event
    'import': 150.0,          # jax + vitpose_tpu imports
    'backend-discovery': 240.0,  # jax.devices(): initializes ALL platforms
    # incl. the axon tunnel - this is where the cold hang lands (135 s
    # observed in round 4, 73 s in the round-5 shakedown run)
    'cpu-init': 120.0,        # flax init on the host CPU backend
    'device-contact': 120.0,  # first explicit transfer to the TPU
    'params-to-device': 90.0,
    'make-inputs': 120.0,     # device-side RNG batch generation
    'int8-calibrate': 150.0,
    'compile+warmup': 280.0,  # first compile 20-40 s (cached after)
}
ITER_DEADLINE_S = 90.0        # per timed dispatch (~2 s when healthy)

T0 = time.time()


def log(msg):
    tag = 'child' if os.environ.get('BENCH_CHILD') == '1' else 'super'
    print(f'[bench/{tag} +{time.time() - T0:6.1f}s] {msg}', file=sys.stderr,
          flush=True)


# ---------------------------------------------------------------------------
# Supervisor side (no jax)
# ---------------------------------------------------------------------------

def _read_events(path):
    events = []
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    events.append(json.loads(line))
                except ValueError:
                    pass  # torn final line of a killed child
    except OSError:
        pass
    return events


def supervise(child_cmd, events_path, global_deadline, env=None,
              phase_deadlines=None, iter_deadline=ITER_DEADLINE_S,
              poll_s=0.5):
    """Run child_cmd, enforcing a deadline per phase via the events file.

    The child appends JSON lines: {"event": "phase", "phase": name},
    {"event": "warmup"|"iter", "dt": seconds, "imgs": count},
    {"event": "done"}. Returns (events, status) with status one of
    'done', 'exited:<rc>', 'killed:<phase>'.
    """
    deadlines = dict(PHASE_DEADLINES if phase_deadlines is None
                     else phase_deadlines)
    try:
        os.remove(events_path)
    except OSError:
        pass
    proc = subprocess.Popen(child_cmd, env=env, start_new_session=True,
                            stdout=sys.stderr, stderr=sys.stderr)
    phase, phase_t0, n_seen = 'spawn', time.time(), 0
    status = None
    while True:
        rc = proc.poll()
        events = _read_events(events_path)
        if len(events) > n_seen:
            # a new event resets the clock; current phase = last phase
            # event (iter events count as progress inside their phase)
            n_seen = len(events)
            phase_t0 = time.time()
            for ev in events:
                if ev.get('event') == 'phase':
                    phase = ev.get('phase', phase)
        if any(ev.get('event') == 'done' for ev in events):
            status = 'done'
            try:
                proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                _kill_group(proc)
            break
        if rc is not None:
            status = 'done' if rc == 0 else f'exited:{rc}'
            break
        now = time.time()
        limit = (iter_deadline if phase.startswith('iter')
                 else deadlines.get(phase, 120.0))
        if now - phase_t0 > limit:
            log(f'DEADLINE: child stuck {now - phase_t0:.0f}s in phase='
                f'{phase} (limit {limit:.0f}s) - killing process group')
            _kill_group(proc)
            status = f'killed:{phase}'
            break
        if now > global_deadline:
            log(f'GLOBAL BUDGET exhausted in phase={phase} - killing child')
            _kill_group(proc)
            status = f'killed:{phase}'
            break
        time.sleep(poll_s)
    return _read_events(events_path), status


def _kill_group(proc):
    # SIGTERM first: a merely-slow (not GIL-hung) child can release the
    # TPU grant cleanly - a SIGKILLed TPU process leaves the chip claimed
    # via the loopback relay for minutes, which would also starve the
    # retry attempt. A truly hung child ignores SIGTERM and gets SIGKILL.
    try:
        os.killpg(proc.pid, signal.SIGTERM)
    except (ProcessLookupError, PermissionError):
        pass
    try:
        proc.wait(timeout=8)
        return
    except subprocess.TimeoutExpired:
        pass
    try:
        os.killpg(proc.pid, signal.SIGKILL)
    except (ProcessLookupError, PermissionError):
        pass
    try:
        proc.wait(timeout=10)
    except subprocess.TimeoutExpired:
        pass


def result_from_events(events, status):
    """Single result dict from everything the child(ren) managed to record.

    Preference: median img/s over completed timed dispatches; else the
    warmup dispatch (includes compile -> lower bound); else an explicit
    zero record naming the phase that hung. Never raises.
    """
    metric = 'vitpose_b_256x192_e2e_infer'
    for ev in events:
        if ev.get('event') == 'meta' and ev.get('metric'):
            metric = ev['metric']
    iters = [ev for ev in events
             if ev.get('event') == 'iter' and ev.get('dt', 0) > 0]
    warms = [ev for ev in events
             if ev.get('event') == 'warmup' and ev.get('dt', 0) > 0]
    complete = status == 'done'
    if iters:
        rates = sorted(ev['imgs'] / ev['dt'] for ev in iters)
        value = rates[len(rates) // 2]
        note = None
    elif warms:
        ev = warms[-1]
        value = ev['imgs'] / ev['dt']
        note = 'warmup-only (includes compile): lower bound'
        complete = False
    else:
        phase = 'start'
        for ev in events:
            if ev.get('event') == 'phase':
                phase = ev.get('phase', phase)
        out = {'metric': metric, 'value': 0.0, 'unit': 'imgs/sec/chip',
               'vs_baseline': 0.0, 'partial': True,
               'note': f'no dispatch completed; last phase={phase}, '
                       f'status={status}'}
        return out
    out = {'metric': metric, 'value': round(value, 2),
           'unit': 'imgs/sec/chip',
           'vs_baseline': round(value / A100_BASELINE_IMGS_PER_SEC, 4)}
    if not complete:
        out['partial'] = True
        out['completed_iters'] = len(iters)
        if note:
            out['note'] = note
    return out


def main_supervisor():
    t_end = T0 + GLOBAL_BUDGET_S
    env = dict(os.environ, BENCH_CHILD='1', BENCH_EVENTS=EVENTS_PATH)
    # BENCH_CHILD_SCRIPT: test hook - lets the supervisor be driven end to
    # end with a stub child (no jax) in tests/test_bench_supervisor.py
    child = [sys.executable,
             os.environ.get('BENCH_CHILD_SCRIPT', os.path.abspath(__file__))]
    log(f'attempt 1: GROUP={GROUP} ITERS={ITERS} '
        f'(global budget {GLOBAL_BUDGET_S:.0f}s)')
    events, status = supervise(child, EVENTS_PATH, t_end, env=env)
    all_events = list(events)
    have_iters = any(ev.get('event') == 'iter' for ev in events)
    if status != 'done' and not have_iters and t_end - time.time() > 120:
        # transient tunnel hang: one cheap retry (compile cache is warm)
        retry_env = dict(env, BENCH_GROUP='4', BENCH_ITERS='2')
        log(f'attempt 1 {status} with no timed dispatch - retrying small '
            f'(GROUP=4 ITERS=2, {t_end - time.time():.0f}s left)')
        events2, status = supervise(child, EVENTS_PATH, t_end, env=retry_env)
        all_events += events2
    res = result_from_events(all_events, status)
    log(f'final status={status}')
    print(json.dumps(res), flush=True)


# ---------------------------------------------------------------------------
# Child side (all jax work lives here)
# ---------------------------------------------------------------------------

class EventWriter:
    def __init__(self, path):
        self._f = open(path, 'a', buffering=1)

    def emit(self, **kw):
        self._f.write(json.dumps(kw) + '\n')
        self._f.flush()
        os.fsync(self._f.fileno())

    def phase(self, name):
        log(f'phase: {name}')
        self.emit(event='phase', phase=name, t=round(time.time() - T0, 1))


def fold_normalization(variables, mean, std):
    """Fold x' = (x/255 - mean)/std into the patch-embed conv (exact):
    conv(W, x') + b == conv(W/(255*std), x) + (b - sum_hw W @ (mean/std))."""
    import jax.numpy as jnp
    import numpy as np
    params = variables['params']
    pe = dict(params['backbone']['patch_embed'])
    w = np.asarray(pe['kernel'], np.float32)          # [kh, kw, 3, D]
    b = np.asarray(pe['bias'], np.float32)
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    w_new = w / (255.0 * std)[None, None, :, None]
    b_new = b + np.einsum('hwcd,c->d', w, -mean / std)
    pe['kernel'] = jnp.asarray(w_new, np.asarray(pe['kernel']).dtype)
    pe['bias'] = jnp.asarray(b_new, np.asarray(pe['bias']).dtype)
    backbone = dict(params['backbone'])
    backbone['patch_embed'] = pe
    params = dict(params)
    params['backbone'] = backbone
    out = dict(variables)
    out['params'] = params
    return out


def main_child():
    ew = EventWriter(EVENTS_PATH)
    ew.phase('import')
    import dataclasses as dc
    import jax
    import jax.numpy as jnp
    import numpy as np
    try:  # persistent compile cache: reruns/retries skip the 20-40s compile
        jax.config.update('jax_compilation_cache_dir',
                          os.path.join(os.path.dirname(__file__) or '.',
                                       '.jax_cache'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception as e:  # unsupported on some backends - fine
        log(f'compilation cache unavailable: {e}')
    from vitpose_tpu.models import TopDownModel, make_config
    from vitpose_tpu.ops.decode import keypoints_from_heatmaps
    from vitpose_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD

    cfg = make_config('b', img_size=(256, 192), out_channels=17,
                      dtype='bfloat16')
    cfg = dc.replace(cfg, backbone=dc.replace(cfg.backbone,
                                              fused_attention=True,
                                              gelu_approx=True))
    model = TopDownModel(cfg)
    # BENCH_INT8=1: W8A8 MLP with calibrated static scales (the TensorRT
    # int8-calibration counterpart; see utils/quantize.py). Measured
    # 2819 img/s (2.99x baseline) vs 2499 bf16 on v5e; kept off the
    # headline so the recorded number stays comparable to the fp16
    # TensorRT baseline conditions (real-geometry OKS-floor finding:
    # PERF.md int8 section).
    int8 = os.environ.get('BENCH_INT8', '0') == '1'
    int8_qkv = os.environ.get('BENCH_INT8_QKV', '0') == '1'
    int8 = int8 or int8_qkv
    # BENCH_INT8_SKIP=K: keep the first and last K blocks bf16
    # (selective quantization; PERF.md sweep)
    int8_skip = int(os.environ.get('BENCH_INT8_SKIP', '0'))
    metric = ('vitpose_b_256x192_e2e_infer'
              + ('_int8' if int8 else '') + ('_qkv' if int8_qkv else '')
              + (f'_skip{int8_skip}' if int8 and int8_skip else ''))
    ew.emit(event='meta', metric=metric, group=GROUP, batch=BATCH,
            iters=ITERS)

    # jax.devices('cpu') triggers discovery of EVERY platform, including
    # the axon tunnel backend - the cold-tunnel hang lands here, so it
    # gets its own phase with the largest deadline
    ew.phase('backend-discovery')
    cpu = jax.devices('cpu')[0]

    # --- host-only work: nothing below touches the TPU ---
    ew.phase('cpu-init')
    rng = jax.random.PRNGKey(0)
    with jax.default_device(cpu):
        variables = jax.jit(model.init)(rng, jnp.zeros((1, 256, 192, 3)))
    variables = fold_normalization(variables, IMAGENET_MEAN, IMAGENET_STD)

    # --- first device contact: an explicit tiny transfer, so a cold
    # tunnel hang lands in a phase whose only job is to absorb it ---
    ew.phase('device-contact')
    dev = jax.devices()[0]
    probe = jax.device_put(np.zeros((4,), np.float32), dev)
    probe.block_until_ready()

    ew.phase('params-to-device')
    variables = jax.device_put(variables, dev)
    jax.block_until_ready(variables)

    ew.phase('make-inputs')
    # distinct inputs per timed iteration: the remote-execution path can
    # dedupe identical dispatches, which silently breaks the timing.
    # Generated ON DEVICE (tiny PRNGKey is the only transfer) - shipping
    # GROUP*BATCH uint8 canvases over the tunnel would dwarf the compute.
    @jax.jit
    def gen(key):
        return jax.random.randint(key, (GROUP, BATCH, 256, 192, 3),
                                  0, 255, dtype=jnp.int32).astype(jnp.uint8)
    batches = [gen(jax.random.PRNGKey(i)) for i in range(WARMUP + ITERS)]
    jax.block_until_ready(batches)
    center = jnp.tile(jnp.asarray([[320.0, 240.0]]), (BATCH, 1))
    scale = jnp.tile(jnp.asarray([[1.2, 1.6]]), (BATCH, 1))

    if int8:
        ew.phase('int8-calibrate')
        from vitpose_tpu.utils.quantize import (calibrate_act_scales,
                                                first_last_skip,
                                                int8_serving_config)
        cal = [np.asarray(batches[0][0, :8], np.float32)]
        scales = calibrate_act_scales(model, variables, cal, attn=int8_qkv)
        skip = first_last_skip(cfg.backbone.depth, int8_skip, int8_skip)
        model = TopDownModel(int8_serving_config(cfg, scales, qkv=int8_qkv,
                                                 skip_blocks=skip))

    @jax.jit
    def end_to_end(variables, imgs8_group):
        def body(carry, imgs8):
            x = imgs8.astype(jnp.float32)     # normalization lives in the
            hm = model.apply(variables, x, train=False)  # patch-embed conv
            preds, maxvals = keypoints_from_heatmaps(
                hm, center, scale, post_process='default', use_udp=True)
            return carry, (preds, maxvals)
        _, outs = jax.lax.scan(body, 0, imgs8_group)
        return outs

    def sync(x):
        # block_until_ready is not a reliable barrier on the remote-tunnel
        # backend; a tiny host readback is.
        return float(np.asarray(x)[0, 0, 0, 0])

    ew.phase('compile+warmup')
    t0 = time.perf_counter()
    for b in range(WARMUP):
        preds, _ = end_to_end(variables, batches[b])
        sync(preds)
    ew.emit(event='warmup', dt=time.perf_counter() - t0, imgs=GROUP * BATCH)
    log(f'warmup done; timing {ITERS} dispatches of {GROUP * BATCH} imgs')

    # median per-dispatch rate (the parent takes the median): robust to
    # occasional multi-ms hiccups of the sandbox tunnel
    for b in range(WARMUP, WARMUP + ITERS):
        ew.phase(f'iter-{b - WARMUP + 1}/{ITERS}')
        t0 = time.perf_counter()
        preds, _ = end_to_end(variables, batches[b])
        sync(preds)
        dt = time.perf_counter() - t0
        ew.emit(event='iter', dt=dt, imgs=GROUP * BATCH)
        log(f'iter {b - WARMUP + 1}/{ITERS}: {dt * 1e3:.1f} ms '
            f'({GROUP * BATCH / dt:.0f} img/s)')

    ew.emit(event='done')


if __name__ == '__main__':
    if os.environ.get('BENCH_CHILD') == '1':
        main_child()
    elif os.environ.get('BENCH_NO_SUPERVISE') == '1':
        try:
            os.remove(EVENTS_PATH)   # don't merge a previous run's events
        except OSError:
            pass
        main_child()
        print(json.dumps(result_from_events(_read_events(EVENTS_PATH),
                                            'done')), flush=True)
    else:
        main_supervisor()

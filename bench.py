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

Resilience (round 4): the sandbox's remote-execution tunnel occasionally
stalls a single dispatch indefinitely (round 3's driver run timed out with
no output). This script therefore
  * prints per-phase progress to stderr (import/init/compile/warmup/iter k),
  * runs a WATCHDOG THREAD (not SIGALRM — a Python signal handler cannot
    interrupt a blocked C readback) that, after BENCH_WATCHDOG_S seconds,
    emits the final JSON from whatever timed iterations already completed
    (flagged "partial": true; falls back to the warmup dispatch time, which
    includes compile and therefore underestimates) and exits 0,
  * sizes the default measurement well inside the driver budget
    (1 warmup + 5 timed dispatches ~ 10 s of device time after compile).
Env knobs: BENCH_ITERS, BENCH_GROUP, BENCH_WATCHDOG_S, BENCH_INT8,
BENCH_INT8_QKV.

Prints ONE json line on stdout: {"metric", "value", "unit", "vs_baseline"}
(+ "partial" if the watchdog fired).
"""
import json
import os
import sys
import threading
import time

A100_BASELINE_IMGS_PER_SEC = 944.0
BATCH = 256
GROUP = int(os.environ.get('BENCH_GROUP', '16'))  # batches per dispatch
WARMUP = 1                      # (amortizes host/tunnel latency)
ITERS = int(os.environ.get('BENCH_ITERS', '5'))
WATCHDOG_S = float(os.environ.get('BENCH_WATCHDOG_S', '420'))

T0 = time.time()

# Shared with the watchdog thread. The main thread only appends/sets.
STATE = {
    'phase': 'start',
    'times': [],              # completed timed dispatch durations (s)
    'warmup_time': None,      # warmup dispatch duration incl. compile (s)
    'metric': 'vitpose_b_256x192_e2e_infer',
    'emitted': False,
}
_EMIT_LOCK = threading.Lock()


def log(msg):
    print(f'[bench +{time.time() - T0:6.1f}s] {msg}', file=sys.stderr,
          flush=True)


def _result_json(partial=False):
    times = list(STATE['times'])
    if times:
        dt = sorted(times)[len(times) // 2]
        note = None
    elif STATE['warmup_time']:
        # compile is folded in -> underestimates throughput; still a number
        dt = STATE['warmup_time']
        note = 'warmup-only (includes compile): lower bound'
    else:
        return None
    out = {
        'metric': STATE['metric'],
        'value': round(GROUP * BATCH / dt, 2),
        'unit': 'imgs/sec/chip',
        'vs_baseline': round(GROUP * BATCH / dt / A100_BASELINE_IMGS_PER_SEC,
                             4),
    }
    if partial:
        out['partial'] = True
        out['completed_iters'] = len(times)
        if note:
            out['note'] = note
    return out


def emit(partial=False):
    with _EMIT_LOCK:
        if STATE['emitted']:
            return
        res = _result_json(partial=partial)
        if res is None:
            # nothing measured at all: emit an explicit failure record so the
            # driver still parses SOMETHING actionable
            res = {'metric': STATE['metric'], 'value': 0.0,
                   'unit': 'imgs/sec/chip', 'vs_baseline': 0.0,
                   'partial': True,
                   'note': f'watchdog fired during phase={STATE["phase"]} '
                           'before any dispatch completed'}
        STATE['emitted'] = True
        print(json.dumps(res), flush=True)


def _watchdog():
    time.sleep(WATCHDOG_S)
    if STATE['emitted']:
        return
    log(f'WATCHDOG fired after {WATCHDOG_S:.0f}s in phase='
        f'{STATE["phase"]} ({len(STATE["times"])}/{ITERS} timed iters done) '
        '- emitting partial result')
    emit(partial=True)
    # the main thread may be stuck in a blocked tunnel readback; hard-exit
    os._exit(0)


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


def main():
    threading.Thread(target=_watchdog, daemon=True).start()

    import dataclasses as dc

    STATE['phase'] = 'import-jax'
    log('importing jax + vitpose_tpu')
    import jax
    import jax.numpy as jnp
    import numpy as np
    try:  # persistent compile cache: reruns skip the 20-40s compile
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
    # TensorRT baseline conditions.
    int8 = os.environ.get('BENCH_INT8', '0') == '1'
    # BENCH_INT8_QKV=1: additionally quantize the attention qkv/proj
    # projections (the remaining 1/3 of block matmul FLOPs).
    int8_qkv = os.environ.get('BENCH_INT8_QKV', '0') == '1'
    int8 = int8 or int8_qkv
    STATE['metric'] = ('vitpose_b_256x192_e2e_infer'
                       + ('_int8' if int8 else '')
                       + ('_qkv' if int8_qkv else ''))
    rng = jax.random.PRNGKey(0)
    STATE['phase'] = 'make-inputs'
    log(f'building {WARMUP + ITERS} input batches '
        f'({GROUP}x{BATCH}x256x192x3 uint8 each)')
    # distinct inputs per timed iteration: the remote-execution path can
    # dedupe identical dispatches, which silently breaks the timing
    batches = [
        jax.random.randint(jax.random.PRNGKey(i),
                           (GROUP, BATCH, 256, 192, 3),
                           0, 255, dtype=jnp.int32).astype(jnp.uint8)
        for i in range(WARMUP + ITERS)
    ]
    center = jnp.tile(jnp.asarray([[320.0, 240.0]]), (BATCH, 1))
    scale = jnp.tile(jnp.asarray([[1.2, 1.6]]), (BATCH, 1))
    STATE['phase'] = 'model-init'
    log('model.init (ViTPose-B bf16)')
    # jit the init: un-jitted flax init issues one tiny dispatch per param,
    # each paying the ~27 ms tunnel latency (measured 125 s vs 20 s jitted)
    variables = jax.jit(model.init)(rng, jnp.zeros((1, 256, 192, 3)))
    variables = fold_normalization(variables, IMAGENET_MEAN, IMAGENET_STD)
    if int8:
        STATE['phase'] = 'int8-calibrate'
        log('calibrating int8 static activation scales')
        from vitpose_tpu.utils.quantize import (calibrate_act_scales,
                                                int8_serving_config)
        cal = [np.asarray(batches[0][0, :8], np.float32)]
        scales = calibrate_act_scales(model, variables, cal, attn=int8_qkv)
        model = TopDownModel(int8_serving_config(cfg, scales, qkv=int8_qkv))

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

    STATE['phase'] = 'compile+warmup'
    log('compile + warmup dispatch (first compile ~20-40s, cached after)')
    t0 = time.perf_counter()
    for b in range(WARMUP):
        preds, _ = end_to_end(variables, batches[b])
        sync(preds)
    STATE['warmup_time'] = time.perf_counter() - t0
    log(f'warmup done in {STATE["warmup_time"]:.1f}s '
        f'(incl. compile); timing {ITERS} dispatches of '
        f'{GROUP * BATCH} imgs')

    # median per-dispatch time: robust to occasional multi-ms hiccups of
    # the sandbox tunnel, which otherwise drag a total-time measurement
    for b in range(WARMUP, WARMUP + ITERS):
        STATE['phase'] = f'iter-{b - WARMUP + 1}/{ITERS}'
        t0 = time.perf_counter()
        preds, _ = end_to_end(variables, batches[b])
        sync(preds)
        dt = time.perf_counter() - t0
        STATE['times'].append(dt)
        log(f'iter {b - WARMUP + 1}/{ITERS}: {dt * 1e3:.1f} ms '
            f'({GROUP * BATCH / dt:.0f} img/s)')

    STATE['phase'] = 'done'
    emit(partial=False)


if __name__ == '__main__':
    main()

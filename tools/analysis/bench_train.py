"""Training throughput: ViTPose-B 256x192 train step (bf16, remat, fused
attention, layer-decay AdamW) on one chip, steps scanned in groups so the
measurement amortizes dispatch latency like a real input-pipelined loop.

Prints one json line {imgs_per_sec, ms_per_step}.

BENCH_E2E=1: instead of synthetic device batches, run the FED loop —
synthetic-JPEG TopDownLoader (train pipeline: decode + aug + collate) in a
prefetch thread feeding the jitted device preprocess (crop/normalize/
target-gen) + train step. Reports sustained end-to-end img/s alongside
the loader-only and step-only component rates, i.e. whether ONE host
process keeps the chip fed for this variant.
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, '/root/repo')

VARIANT = os.environ.get('BENCH_VARIANT', 'b')
BATCH = int(os.environ.get('BENCH_BATCH', '64'))
GROUP = int(os.environ.get('BENCH_TRAIN_GROUP', '4'))
WARMUP = 1
ITERS = int(os.environ.get('BENCH_TRAIN_ITERS', '3'))

_T0 = time.perf_counter()


def log(msg):
    """Phase progress to stderr (the round-3 bench timeout shipped with
    zero output; every long phase now announces itself)."""
    print(f'[bench_train +{time.perf_counter() - _T0:6.1f}s] {msg}',
          file=sys.stderr, flush=True)


def _setup_cache(jax):
    try:  # persistent compile cache: reruns/retries skip the compile
        jax.config.update('jax_compilation_cache_dir',
                          '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception as e:
        log(f'compilation cache unavailable: {e}')


def main():
    import dataclasses as dc
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vitpose_tpu.models import TopDownModel, make_config
    from vitpose_tpu.train import (OptimConfig, layer_decay_adamw,
                                   create_train_state, make_train_step)

    _setup_cache(jax)
    remat = os.environ.get('BENCH_REMAT', '1') == '1'
    policy = os.environ.get('BENCH_REMAT_POLICY', 'full')
    log(f'variant={VARIANT} batch={BATCH} remat={remat} policy={policy}')
    cfg = make_config(VARIANT, img_size=(256, 192), out_channels=17,
                      dtype='bfloat16', remat=remat, remat_policy=policy)
    cfg = dc.replace(cfg, backbone=dc.replace(cfg.backbone,
                                              fused_attention=True))
    model = TopDownModel(cfg)
    rng = jax.random.PRNGKey(0)
    imgs0 = jnp.zeros((BATCH, 256, 192, 3), jnp.float32)
    ocfg = OptimConfig(base_lr=5e-4, num_layers=cfg.backbone.depth)
    # init on the host CPU backend, then ONE bulk device_put: the jitted
    # on-device init was the phase that ate the round-4 driver bench run
    # when the tunnel hung (see bench.py round-5 notes)
    log('init params + opt state on host CPU backend')
    cpu = jax.devices('cpu')[0]
    with jax.default_device(cpu):
        variables = jax.jit(
            lambda r: model.init(r, imgs0, train=False))(rng)
        tx = layer_decay_adamw(variables['params'], ocfg,
                               steps_per_epoch=1000)
        state = create_train_state(model, rng, imgs0, tx,
                                   variables=variables)
    log('device_put train state (first device contact)')
    state = jax.device_put(state, jax.devices()[0])
    jax.block_until_ready(state.params)
    step = make_train_step(model)
    log('state ready')

    def batches(i):
        k = jax.random.PRNGKey(i)
        return {
            'imgs': jax.random.normal(k, (GROUP, BATCH, 256, 192, 3),
                                      dtype=jnp.float32),
            'target': jax.random.uniform(k, (GROUP, BATCH, 17, 64, 48)),
            'target_weight': jnp.ones((GROUP, BATCH, 17), jnp.float32),
        }

    # donate the state like the real loop does (parallel/mesh.py
    # shard_train_step donate_argnums=(0,)): params/m/v update in place,
    # halving the peak optimizer-state footprint during the step
    @partial(jax.jit, donate_argnums=(0,))
    def run(state, group, rng):
        def body(carry, batch):
            st, r = carry
            r, sub = jax.random.split(r)
            st, metrics = step(st, batch, sub)
            return (st, r), metrics['heatmap_loss']
        (state, _), losses = jax.lax.scan(body, (state, rng), group)
        return state, losses

    def sync(x):
        return float(np.asarray(jnp.ravel(x)[0]))

    for i in range(WARMUP):
        log(f'warmup {i} (compiles on first call)')
        state, losses = run(state, batches(i), jax.random.PRNGKey(i))
        sync(losses)
    log('measuring')
    t0 = time.perf_counter()
    for i in range(WARMUP, WARMUP + ITERS):
        state, losses = run(state, batches(i), jax.random.PRNGKey(i))
        sync(losses)
        log(f'iter {i - WARMUP + 1}/{ITERS} done')
    dt = time.perf_counter() - t0
    ips = GROUP * BATCH * ITERS / dt
    print(json.dumps({'metric': f'vitpose_{VARIANT}_256x192_train',
                      'imgs_per_sec': round(ips, 1),
                      'ms_per_step': round(dt / (GROUP * ITERS) * 1e3, 1)}))


def main_e2e():
    """Fed training loop: host loader thread -> queue -> device step."""
    import dataclasses as dc
    import queue
    import tempfile
    import threading

    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(__file__))
    from bench_io import make_jpegs
    from vitpose_tpu.data import DatasetInfo
    from vitpose_tpu.data.loader import TopDownLoader
    from vitpose_tpu.data.pipeline import make_preprocess_fn
    from vitpose_tpu.models import TopDownModel, make_config
    from vitpose_tpu.train import (OptimConfig, layer_decay_adamw,
                                   create_train_state, make_train_step)

    _setup_cache(jax)
    n_imgs = int(os.environ.get('BENCH_E2E_IMGS', '768'))
    log(f'e2e: generating {n_imgs} synthetic JPEGs')
    tmpdir = tempfile.mkdtemp()
    paths = make_jpegs(tmpdir, n_imgs)
    recs = []
    for i, p in enumerate(paths):
        recs.append(dict(
            image_file=p,
            bbox=np.asarray([200.0, 120.0, 240.0, 320.0], np.float32),
            rotation=0,
            joints_3d=np.tile(np.asarray([[300.0, 200.0, 0.0]],
                                         np.float32), (17, 1)),
            joints_3d_visible=np.tile(
                np.asarray([[1.0, 1.0, 0.0]], np.float32), (17, 1)),
            bbox_score=1.0, bbox_id=i, image_id=i, dataset_idx=0))

    class _DS:
        db = recs
        num_joints = 17
        image_size = (192, 256)
        heatmap_size = (48, 64)
        info = DatasetInfo.load('coco')
        dataset_idx = 0
        name = 'synthetic'

    loader = TopDownLoader(_DS(), BATCH, is_train=True, canvas_size=640,
                           seed=0)

    # loader-only rate (one full pass, warm page cache)
    for _ in loader:
        pass
    t0 = time.perf_counter()
    n = 0
    for b in loader:
        n += int(b['imgs'].shape[0])
    loader_ips = n / (time.perf_counter() - t0)

    remat = os.environ.get('BENCH_REMAT', '1') == '1'
    policy = os.environ.get('BENCH_REMAT_POLICY', 'full')
    cfg = make_config(VARIANT, img_size=(256, 192), out_channels=17,
                      dtype='bfloat16', remat=remat, remat_policy=policy)
    cfg = dc.replace(cfg, backbone=dc.replace(cfg.backbone,
                                              fused_attention=True))
    model = TopDownModel(cfg)
    rng = jax.random.PRNGKey(0)
    preprocess = make_preprocess_fn(image_size=(192, 256),
                                    heatmap_size=(48, 64))
    imgs0 = jnp.zeros((BATCH, 256, 192, 3), jnp.float32)
    ocfg = OptimConfig(base_lr=5e-4, num_layers=cfg.backbone.depth)
    log('e2e: init model on host CPU backend')
    cpu = jax.devices('cpu')[0]
    with jax.default_device(cpu):
        variables = jax.jit(
            lambda r: model.init(r, imgs0, train=False))(rng)
        tx = layer_decay_adamw(variables['params'], ocfg,
                               steps_per_epoch=1000)
        state = create_train_state(model, rng, imgs0, tx,
                                   variables=variables)
    state = jax.device_put(state, jax.devices()[0])
    step = jax.jit(make_train_step(model), donate_argnums=0)

    # BENCH_E2E_MODE=canvas ships full uint8 canvases (78.7 MB/batch-64,
    # warp+target-gen on device); =crop warps ON THE HOST via the same
    # jax code pinned to the CPU backend and ships 256x192 uint8 crops
    # (9.4 MB/batch — the reference's own wire format: its dataloader
    # workers ship cv2-warped crops, top_down_transform.py TopDownAffine).
    # BENCH_E2E_CACHE=1 adds a decode-once RAM cache (loader output
    # replayed), isolating the wire from the JPEG-decode bound.
    mode = os.environ.get('BENCH_E2E_MODE', 'canvas')
    use_cache = os.environ.get('BENCH_E2E_CACHE', '0') == '1'
    if mode == 'crop':
        from vitpose_tpu.data.pipeline import (make_device_finish_fn,
                                               make_host_crop_fn)
        host_crop = make_host_crop_fn(image_size=(192, 256))
        finish = make_device_finish_fn(image_size=(192, 256),
                                       heatmap_size=(48, 64))

        def to_wire(b):
            crops, joints_c = host_crop(b['imgs'], b['center'], b['scale'],
                                        b['rot'], b['joints'],
                                        b.get('flip'))
            return {'crops': np.asarray(crops),
                    'joints_c': np.asarray(joints_c),
                    'vis': np.asarray(b['vis'])}

        def device_batch(w, i):
            pre = finish(w['crops'], w['joints_c'], w['vis'])
            return {'imgs': pre['imgs'], 'target': pre['target'],
                    'target_weight': pre['target_weight']}
    else:
        def to_wire(b):
            return b

        def device_batch(w, i):
            pre = preprocess(w['imgs'], w['center'], w['scale'], w['rot'],
                             w['joints'], w['vis'], w.get('flip'))
            return {'imgs': pre['imgs'], 'target': pre['target'],
                    'target_weight': pre['target_weight']}

    q = queue.Queue(maxsize=4)
    stop = threading.Event()

    def feed():
        if use_cache:
            cached = [to_wire(b) for b in loader]   # decode once
            while not stop.is_set():
                for w in cached:
                    if stop.is_set():
                        return
                    q.put(w)
            return
        epoch = 0
        while not stop.is_set():
            loader.set_epoch(epoch)
            for b in loader:
                if stop.is_set():
                    return
                q.put(to_wire(b))
            epoch += 1

    th = threading.Thread(target=feed, daemon=True)
    th.start()

    def one(state, w, i):
        return step(state, device_batch(w, i), jax.random.fold_in(rng, i))

    log('e2e: compile step')
    state, m = one(state, q.get(), 0)      # compile
    float(m['heatmap_loss'])
    steps = int(os.environ.get('BENCH_E2E_STEPS', '40'))
    log(f'e2e: measuring {steps} steps')
    # double-buffer: enqueue the device work for batch i while the host
    # thread readies i+1; jax dispatch is async so the transfer of the
    # next batch overlaps the running step
    t0 = time.perf_counter()
    for i in range(1, steps + 1):
        state, m = one(state, q.get(), i)
    float(m['heatmap_loss'])               # drain the device
    e2e_ips = steps * BATCH / (time.perf_counter() - t0)
    stop.set()
    try:
        q.get_nowait()                     # unblock the feeder
    except queue.Empty:
        pass

    # step-only rate under the SAME program (device preprocess + step),
    # replaying one already-loaded host batch
    b0 = to_wire(next(iter(loader)))
    state, m = one(state, b0, 0)
    float(m['heatmap_loss'])
    t0 = time.perf_counter()
    for i in range(20):
        state, m = one(state, b0, i)
    float(m['heatmap_loss'])
    step_ips = 20 * BATCH / (time.perf_counter() - t0)

    print(json.dumps({
        'metric': f'vitpose_{VARIANT}_256x192_train_e2e',
        'mode': mode, 'cache': use_cache,
        'e2e_imgs_per_sec': round(e2e_ips, 1),
        'loader_imgs_per_sec': round(loader_ips, 1),
        'step_imgs_per_sec': round(step_ips, 1),
        'fed': bool(loader_ips >= step_ips),
        'host_processes_needed': max(1, int(np.ceil(step_ips
                                                    / loader_ips))),
    }))


if __name__ == '__main__':
    if os.environ.get('BENCH_E2E', '0') == '1':
        main_e2e()
    else:
        main()

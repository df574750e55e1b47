"""parallel/distributed.py: single-process init no-op + SIGTERM
preemption guard (beyond-reference failure handling, SURVEY §5) + a real
2-process multi-controller training run."""
import os
import signal

import pytest


def test_init_distributed_single_process_noop():
    from vitpose_tpu.parallel.distributed import init_distributed
    pi, pc = init_distributed()
    assert pi == 0 and pc == 1


def test_init_distributed_slurm_single_task_noop(monkeypatch):
    # SLURM_NTASKS=1 (or empty) must not attempt cluster init
    from vitpose_tpu.parallel.distributed import init_distributed
    monkeypatch.setenv('SLURM_NTASKS', '1')
    pi, pc = init_distributed()
    assert pi == 0 and pc == 1
    monkeypatch.setenv('SLURM_NTASKS', '')
    pi, pc = init_distributed()
    assert pi == 0 and pc == 1


def test_cli_entrypoints_call_init_distributed():
    """tools/train.py and tools/test.py must bootstrap multi-host init —
    the launchers (dist_train.sh, slurm_*.sh) only set the env, nothing
    else consumes it."""
    import re
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in ('train.py', 'test.py'):
        src = open(os.path.join(repo, 'tools', name)).read()
        assert re.search(r'init_distributed\(\)', src), name


@pytest.mark.slow
def test_two_process_distributed_training(tmp_path):
    """tools/dist_train.sh NPROC=2 on CPU: jax.distributed init, global
    (data) mesh across 2 processes, make_array_from_process_local_data
    batch placement, rank-0-only logging. This is the path the round-2
    review found completely unwired (each task trained independently)."""
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ref = '/root/reference/tests/data/coco'
    if not os.path.exists(f'{ref}/test_coco.json'):
        pytest.skip('fixture missing')
    wd = tmp_path / 'wd'
    cfg = tmp_path / 'cfg.py'
    cfg.write_text(f"""
_base_ = ['{repo}/vitpose_tpu/configs/base/default_runtime.py']
model = dict(variant='s', img_size=(64, 48), out_channels=17,
             head='heatmap', flip_test=True, use_udp=True,
             post_process='default',
             backbone_overrides=dict(embed_dim=32, depth=2, num_heads=4))
data = dict(dataset='coco', image_size=(48, 64), heatmap_size=(12, 16),
    batch_size=4, canvas_size=640, num_workers=2,
    train=dict(ann_file='{ref}/test_coco.json', img_prefix='{ref}/'))
target = dict(encoding='UDP', sigma=1.5)
optimizer = dict(base_lr=1e-3, warmup_iters=2, decay_epochs=(100, 200),
                 total_epochs=1)
runtime = dict(work_dir='{wd}', log_interval=1, eval_interval=0,
               ckpt_interval=0, seed=0)
""")
    env = dict(os.environ, JAX_PLATFORMS='cpu', NPROC='2')
    # conftest exports an 8-device XLA_FLAGS; here each process must own
    # exactly ONE device so the 2-process mesh is (data=2)
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'
    # forcing a fresh coordinator port per run avoids collisions
    env['PORT'] = str(29600 + os.getpid() % 200)
    out = subprocess.run(
        ['./tools/dist_train.sh', str(cfg), '--max-steps', '3'],
        capture_output=True, text=True, timeout=600, env=env, cwd=repo)
    assert out.returncode == 0, (out.stdout[-1500:], out.stderr[-1500:])
    log = wd / 'train.log.json'
    assert log.exists()
    import json
    records = [json.loads(l) for l in open(log)]
    train_recs = [r for r in records if r.get('mode') == 'train']
    assert train_recs and all(
        r['heatmap_loss'] == r['heatmap_loss'] for r in train_recs)
    # rank-0-only logging: iter 0 must appear exactly once
    assert sum(1 for r in train_recs if r['iter'] == 0) == 1


def test_collect_results_single_process_passthrough():
    from vitpose_tpu.eval.loop import collect_results
    r = [dict(a=1)]
    assert collect_results(r, '/tmp/never_used') is r


@pytest.mark.slow
def test_two_process_sharded_eval_gather(tmp_path):
    """Val-loader process sharding covers every record exactly once
    (wrap-around padding aside) and collect_results merges the shards
    onto rank 0 — the reference multi_gpu_test + collect_results_cpu
    semantics driven for real over 2 processes."""
    import subprocess
    import sys as _sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ref = '/root/reference/tests/data/coco'
    if not os.path.exists(f'{ref}/test_coco.json'):
        pytest.skip('fixture missing')
    script = tmp_path / 'worker.py'
    script.write_text(f"""
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update('jax_platforms', 'cpu')
from vitpose_tpu.parallel.distributed import init_distributed
init_distributed()
from vitpose_tpu.data import topdown_dataset_cls
from vitpose_tpu.data.loader import TopDownLoader
from vitpose_tpu.eval.loop import collect_results
ds = topdown_dataset_cls('coco')(
    {ref!r} + '/test_coco.json', {ref!r} + '/', dataset_info='coco',
    image_size=(48, 64), heatmap_size=(12, 16), test_mode=True,
    use_gt_bbox=True)
loader = TopDownLoader(ds, 4, is_train=False, canvas_size=640,
                       num_workers=1,
                       process_index=jax.process_index(),
                       process_count=jax.process_count())
local = [int(i) for i in loader._indices()]
merged = collect_results([local], {str(tmp_path / 'gather')!r})
if jax.process_index() == 0:
    allidx = sorted(set(i for part in merged for i in part))
    assert allidx == list(range(len(ds.db))), allidx
    print('MERGED_OK', len(merged), len(allidx))
""")
    env = dict(os.environ, JAX_PLATFORMS='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=1')
    coord = f'127.0.0.1:{29800 + os.getpid() % 150}'
    procs = []
    for i in range(2):
        e = dict(env, COORDINATOR_ADDRESS=coord, NUM_PROCESSES='2',
                 PROCESS_ID=str(i))
        procs.append(subprocess.Popen(
            [_sys.executable, str(script)], env=e, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=300) for p in procs]
    assert all(p.returncode == 0 for p in procs), \
        [(o[-800:], e[-800:]) for o, e in outs]
    assert any('MERGED_OK' in o for o, _ in outs)


def test_preemption_guard_sigterm():
    from vitpose_tpu.parallel.distributed import PreemptionGuard
    saved = []
    guard = PreemptionGuard(on_preempt=lambda: saved.append('ckpt'))
    prev = signal.getsignal(signal.SIGTERM)
    try:
        guard.install()
        assert not guard.should_stop
        os.kill(os.getpid(), signal.SIGTERM)
        assert guard.should_stop
        assert saved == ['ckpt']
    finally:
        signal.signal(signal.SIGTERM, prev)

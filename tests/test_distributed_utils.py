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

"""parallel/distributed.py: single-process init no-op + SIGTERM
preemption guard (beyond-reference failure handling, SURVEY §5)."""
import os
import signal


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

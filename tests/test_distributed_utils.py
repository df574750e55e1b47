"""parallel/distributed.py: single-process init no-op + SIGTERM
preemption guard (beyond-reference failure handling, SURVEY §5)."""
import os
import signal


def test_init_distributed_single_process_noop():
    from vitpose_tpu.parallel.distributed import init_distributed
    pi, pc = init_distributed()
    assert pi == 0 and pc == 1


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

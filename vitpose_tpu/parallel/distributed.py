"""Multi-host initialization + graceful preemption handling.

Replaces the reference's `init_dist` / torch.distributed.launch process
bootstrap (reference tools/train.py:149, tools/dist_train.sh) with
`jax.distributed.initialize`, and goes beyond the reference (which has no
failure handling — SURVEY §5) with a SIGTERM-triggered checkpoint hook for
preemptible TPU pools.
"""
from __future__ import annotations

import os
import signal
from typing import Callable, Optional


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Initialize multi-host JAX. No-ops for single-process runs.

    Env-var driven (like torch.distributed.launch): COORDINATOR_ADDRESS,
    NUM_PROCESSES, PROCESS_ID — or pass explicitly. Under SLURM
    (SLURM_NTASKS > 1, tools/slurm_*.sh) jax.distributed's built-in
    cluster detection reads the SLURM_* environment. Called by
    tools/train.py / tools/test.py at startup; idempotent.
    """
    import jax
    coordinator_address = coordinator_address or os.environ.get(
        'COORDINATOR_ADDRESS')
    num_processes = num_processes or int(os.environ.get('NUM_PROCESSES', 0))
    if process_id is None and 'PROCESS_ID' in os.environ:
        process_id = int(os.environ['PROCESS_ID'])
    # process_id stays None when unset so jax.distributed.initialize can
    # auto-detect the rank from the cluster environment (-1 would be
    # forwarded as an invalid explicit rank)
    # idempotence check WITHOUT touching the backend: jax.process_count()
    # would initialize XLA, after which initialize() refuses to run
    if jax.distributed.is_initialized():
        pass
    elif coordinator_address and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    elif int(os.environ.get('SLURM_NTASKS', '1') or 1) > 1:
        # jax's SlurmCluster auto-detection: coordinator = first node,
        # process_id = SLURM_PROCID, num_processes = SLURM_NTASKS
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


class PreemptionGuard:
    """Install a SIGTERM handler that requests a final checkpoint.

    The training loop checks `.should_stop` each iteration; on preemption
    it saves and exits cleanly rather than dying mid-step.
    """

    def __init__(self, on_preempt: Optional[Callable] = None):
        self.should_stop = False
        self._on_preempt = on_preempt
        self._prev = None

    def install(self):
        def handler(signum, frame):
            self.should_stop = True
            if self._on_preempt is not None:
                self._on_preempt()
            if callable(self._prev):
                self._prev(signum, frame)
        self._prev = signal.signal(signal.SIGTERM, handler)
        return self


def init_random_seed(seed: Optional[int] = None) -> int:
    """Pick a training seed and make it identical on every process
    (counterpart of reference apis/train.py:27 `init_random_seed`, which
    broadcasts a random seed over torch.distributed)."""
    if seed is not None:
        return int(seed)
    import numpy as np
    seed = int(np.random.randint(2 ** 31))
    import jax
    if jax.process_count() > 1:
        import jax.numpy as jnp
        from jax.experimental import multihost_utils
        seed = int(multihost_utils.broadcast_one_to_all(jnp.int32(seed)))
    return seed

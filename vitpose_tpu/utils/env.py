"""Environment fingerprinting + logging (counterpart of reference
mmpose/utils/collect_env.py and mmpose/utils/logger.py)."""
from __future__ import annotations

import logging
import sys


def collect_env():
    """Collect environment info dict for reproducibility logging."""
    info = {'python': sys.version.replace('\n', ' ')}
    try:
        import jax
        info['jax'] = jax.__version__
        info['jax_backend'] = jax.default_backend()
        info['devices'] = ', '.join(str(d) for d in jax.devices())
    except Exception as e:           # pragma: no cover
        info['jax'] = f'unavailable ({e})'
    for mod in ('flax', 'optax', 'numpy', 'cv2'):
        try:
            m = __import__(mod)
            info[mod] = getattr(m, '__version__', 'unknown')
        except ImportError:
            info[mod] = 'not installed'
    try:
        import vitpose_tpu
        info['vitpose_tpu'] = vitpose_tpu.__version__
    except Exception:
        pass
    return info


_logger_initialized = {}


def get_root_logger(log_file=None, log_level=logging.INFO,
                    name='vitpose_tpu'):
    """Create/fetch the package logger, optionally tee-ing to a file."""
    logger = logging.getLogger(name)
    if name in _logger_initialized:
        return logger
    fmt = logging.Formatter(
        '%(asctime)s - %(name)s - %(levelname)s - %(message)s')
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.setLevel(log_level)
    logger.propagate = False
    _logger_initialized[name] = True
    return logger


def setup_multi_processes(cfg=None):
    """Clamp per-worker threading so data-loading processes don't
    oversubscribe the host (reference mmpose/utils/setup_env.py:10
    `setup_multi_processes`, minus the torch.multiprocessing start-method
    piece — our loader uses thread pools + the native C++ decoder, not
    forked torch workers).

    On a TPU host this matters doubly: XLA's compile/execute threads
    already saturate the cores, so cv2/OpenMP fan-out inside loader
    workers steals cycles from the input pipeline.
    """
    import os
    cfg = cfg or {}
    data_cfg = cfg.get('data', {}) if isinstance(cfg, dict) else {}
    num_workers = data_cfg.get('num_workers', 1)

    try:
        import cv2
        cv2.setNumThreads(int(cfg.get('opencv_num_threads', 0))
                          if isinstance(cfg, dict) else 0)
    except ImportError:
        pass

    if num_workers > 1:
        for var in ('OMP_NUM_THREADS', 'MKL_NUM_THREADS'):
            if var not in os.environ:
                os.environ[var] = '1'

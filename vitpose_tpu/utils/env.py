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

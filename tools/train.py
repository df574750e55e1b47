#!/usr/bin/env python
"""Training CLI (counterpart of reference tools/train.py).

Usage:
  python tools/train.py CONFIG [--work-dir DIR] [--resume]
      [--cfg-options k.x=v ...] [--max-steps N]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

# honor JAX_PLATFORMS even when a sitecustomize pre-imported jax with a
# different platform baked in
if os.environ.get('JAX_PLATFORMS'):
    import jax
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])


def _replace_path_in_dict(d, old, new):
    """Recursively rewrite path prefixes in a config dict (counterpart of
    the fork's raplace_path_in_dict, tools/train.py:80-87)."""
    items = d.items() if isinstance(d, dict) else enumerate(d)
    for k, v in items:
        if isinstance(v, (dict, list)):
            _replace_path_in_dict(v, old, new)
        elif isinstance(v, str) and (v == old or v.startswith(old + '/')):
            d[k] = new + v[len(old):]
    return d


def main():
    ap = argparse.ArgumentParser(description='Train a top-down pose model')
    ap.add_argument('config')
    ap.add_argument('--work-dir', default=None)
    ap.add_argument('--resume', action='store_true',
                    help='resume from the latest checkpoint in work_dir')
    ap.add_argument('--cfg-options', nargs='*', default=[],
                    help='dotted config overrides, e.g. optimizer.base_lr=1e-4')
    ap.add_argument('--max-steps', type=int, default=None,
                    help='stop after N optimizer steps (smoke tests)')
    ap.add_argument('--seed', type=int, default=None)
    ap.add_argument('--autoscale-lr', action='store_true',
                    help='scale base_lr linearly by device_count/8 '
                         '(reference tools/train.py:134-136)')
    args = ap.parse_args()

    from vitpose_tpu.utils.config import load_config, apply_options
    from vitpose_tpu.train.loop import train_model
    from vitpose_tpu.parallel.distributed import init_distributed

    # multi-host bootstrap (no-op single-process; SLURM/env contract —
    # reference tools/train.py:149 init_dist counterpart)
    init_distributed()

    cfg = apply_options(load_config(args.config), args.cfg_options)
    from vitpose_tpu.utils.env import setup_multi_processes
    setup_multi_processes(cfg)   # clamp cv2/OMP fan-out in workers
    if 'PATH_TO_DATA' in os.environ:
        # relocatable data roots (fork tools/train.py:93-99 substitutes a
        # hardcoded prefix; here the old prefix defaults to 'data' and can
        # be overridden via PATH_TO_DATA_OLD)
        _replace_path_in_dict(cfg, os.environ.get('PATH_TO_DATA_OLD', 'data'),
                              os.environ['PATH_TO_DATA'])
    if args.seed is not None:
        cfg.setdefault('runtime', {})['seed'] = args.seed
    if args.autoscale_lr:
        import jax
        opt = cfg.setdefault('optimizer', {})
        opt['base_lr'] = opt.get('base_lr', 5e-4) * jax.device_count() / 8
    train_model(cfg, work_dir=args.work_dir, resume=args.resume,
                max_steps=args.max_steps)


if __name__ == '__main__':
    main()

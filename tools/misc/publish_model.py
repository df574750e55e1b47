#!/usr/bin/env python
"""Prepare a checkpoint for publishing (counterpart of the reference's
tools/misc/publish_model.py): strip optimizer state, rewrite as a flat
params .npz, and stamp the filename with the content sha256 + date.

Accepts a flat params .npz (save_params_npz format), an orbax checkpoint
directory (the params/batch_stats entries are extracted), or a torch .pth
— converting a .pth to servable flax variables needs the model config
(--config CONFIG.py routes through load_checkpoint_variables, the same
path tools/test.py uses).

Usage:
    python tools/misc/publish_model.py in_ckpt out_file.npz \
        [--config configs/coco/vitpose_b_coco_256x192.py]
"""
import argparse
import hashlib
import os
import sys
from datetime import date

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))


def _load_variables(in_file, config=None):
    from vitpose_tpu.utils.checkpoint import load_params_npz
    if in_file.endswith('.npz'):
        return load_params_npz(in_file)
    if os.path.isdir(in_file):
        import orbax.checkpoint as ocp
        restored = ocp.StandardCheckpointer().restore(
            os.path.abspath(in_file))
        return {k: restored[k] for k in ('params', 'batch_stats')
                if k in restored and restored[k]}
    if in_file.endswith('.pth'):
        if not config:
            raise ValueError(
                'publishing a torch .pth needs --config CONFIG.py so the '
                'state dict can be converted to flax variables (a raw '
                'torch dict in the .npz would not be loadable by '
                'tools/test.py or the inference API)')
        from vitpose_tpu.utils.config import load_config
        from vitpose_tpu.train.loop import build_model_from_cfg
        from vitpose_tpu.api.inference import load_checkpoint_variables
        cfg = load_config(config)
        model = build_model_from_cfg(cfg['model'])
        return load_checkpoint_variables(in_file, dict(cfg['model']),
                                         topdown_cfg=model.cfg)
    raise ValueError(f'unrecognized checkpoint format: {in_file}')


def process_checkpoint(in_file, out_file, config=None):
    from vitpose_tpu.utils.checkpoint import save_params_npz
    variables = _load_variables(in_file, config=config)
    variables.pop('opt_state', None)
    save_params_npz(out_file, variables)

    with open(out_file, 'rb') as f:
        sha = hashlib.sha256(f.read()).hexdigest()
    stem = out_file[:-4] if out_file.endswith('.npz') else out_file
    final_file = f'{stem}-{sha[:8]}_{date.today().strftime("%Y%m%d")}.npz'
    os.replace(out_file, final_file)
    print(f'published {final_file}')
    return final_file


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('in_file')
    ap.add_argument('out_file')
    ap.add_argument('--config', default=None,
                    help='model config (required when publishing a .pth)')
    args = ap.parse_args()
    process_checkpoint(args.in_file, args.out_file, config=args.config)


if __name__ == '__main__':
    main()

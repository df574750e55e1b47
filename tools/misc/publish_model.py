#!/usr/bin/env python
"""Prepare a checkpoint for publishing (counterpart of the reference's
tools/misc/publish_model.py): strip optimizer state, rewrite as a flat
params .npz, and stamp the filename with the content sha256 + date.

Accepts a flat params .npz (save_params_npz format), an orbax checkpoint
directory (the params/batch_stats entries are extracted), or a torch .pth
(converted via the repo's checkpoint ingestion).

Usage:
    python tools/misc/publish_model.py in_ckpt out_file.npz
"""
import argparse
import hashlib
import os
import sys
from datetime import date

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))


def _load_variables(in_file):
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
        from vitpose_tpu.utils.torch_ckpt import load_torch_state_dict
        return {'torch_state_dict': load_torch_state_dict(in_file)}
    raise ValueError(f'unrecognized checkpoint format: {in_file}')


def process_checkpoint(in_file, out_file):
    from vitpose_tpu.utils.checkpoint import save_params_npz
    variables = _load_variables(in_file)
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
    args = ap.parse_args()
    process_checkpoint(args.in_file, args.out_file)


if __name__ == '__main__':
    main()

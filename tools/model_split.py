#!/usr/bin/env python
"""Split a ViTPose+ (MoE) checkpoint into single-task checkpoints
(counterpart of reference tools/model_split.py: merges expert-i rows back
onto fc2, renames associate head i -> keypoint_head, truncates the final
layer to the dataset's keypoint count).

Usage:
  python tools/model_split.py SOURCE.pth --out-dir DIR \
      [--datasets coco aic mpii ap10k apt36k wholebody]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def _apply_platform_env():
    # honor JAX_PLATFORMS even when a sitecustomize pre-imported jax with
    # a different platform baked in. CLI-only: calling this at import time
    # would silently flip library users (e.g. CPU-pinned tests) onto the
    # env's platform.
    if os.environ.get('JAX_PLATFORMS'):
        import jax
        jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

DATASET_KPTS = dict(coco=17, aic=14, mpii=16, ap10k=17, apt36k=17,
                    wholebody=133)


def split_one(sd, expert_id, num_kpts, depth):
    from vitpose_tpu.utils.torch_ckpt import merge_moe_expert
    out = merge_moe_expert(sd, expert_id, depth)
    # associate head expert_id-1 -> keypoint_head (expert 0 keeps the main)
    if expert_id > 0:
        prefix = f'associate_keypoint_heads.{expert_id - 1}.'
        renamed = {}
        for k, v in out.items():
            if k.startswith('associate_keypoint_heads.'):
                if k.startswith(prefix):
                    renamed['keypoint_head.' + k[len(prefix):]] = v
            elif k.startswith('keypoint_head.'):
                continue
            else:
                renamed[k] = v
        out = renamed
    else:
        out = {k: v for k, v in out.items()
               if not k.startswith('associate_keypoint_heads.')}
    # truncate final layer to this dataset's keypoint count
    for k in list(out):
        if k.startswith('keypoint_head.final_layer.'):
            out[k] = out[k][:num_kpts]
    return out


def main():
    _apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument('source')
    ap.add_argument('--out-dir', required=True)
    ap.add_argument('--datasets', nargs='*',
                    default=['coco', 'aic', 'mpii', 'ap10k', 'apt36k',
                             'wholebody'])
    args = ap.parse_args()

    from vitpose_tpu.utils.torch_ckpt import load_torch_state_dict
    sd = load_torch_state_dict(args.source)
    depth = 1 + max(int(k.split('.')[2]) for k in sd
                    if k.startswith('backbone.blocks.'))
    os.makedirs(args.out_dir, exist_ok=True)
    for i, name in enumerate(args.datasets):
        out = split_one(sd, i, DATASET_KPTS.get(name, 17), depth)
        path = os.path.join(args.out_dir, f'{name}.npz')
        np.savez(path, **out)
        print(f'wrote {path} ({len(out)} tensors)')


if __name__ == '__main__':
    main()

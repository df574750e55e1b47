"""Prune old checkpoints under work_dirs (reference fork's
prune_work_dirs.py, adapted to the orbax layout).

Each run directory holds numbered orbax step dirs (``<work_dir>/<step>/``)
plus an optional ``best`` dir / ``best.json`` marker which is never pruned.
``--keep-method uniform`` keeps the last step plus a uniform subsample of
earlier ones (the reference's selection rule); ``last`` keeps the N most
recent.

Usage:
    python tools/prune_work_dirs.py --workdir work_dirs --num-keep 3 [--dry]
"""
import argparse
import os
import shutil


def select_checkpoints(steps, num_keep, method='uniform'):
    """Which step numbers to KEEP (reference prune_work_dirs.py:41-66)."""
    steps = sorted(steps)
    num_keep = min(num_keep, len(steps))
    if num_keep <= 0 or not steps:
        return set()
    if method == 'last':
        return set(steps[-num_keep:])
    keep = {steps[-1]}
    rest = num_keep - 1
    if rest > 0:
        stride = max(len(steps) // rest, 1)
        keep.update(steps[::stride][:rest])
    return keep


def prune_run_dir(run_dir, num_keep, method='uniform', dry=False):
    """Returns (kept, removed) step lists for one run directory."""
    steps = []
    for name in os.listdir(run_dir):
        if name.isdigit() and os.path.isdir(os.path.join(run_dir, name)):
            steps.append(int(name))
    keep = select_checkpoints(steps, num_keep, method)
    removed = []
    for s in sorted(steps):
        if s in keep:
            continue
        path = os.path.join(run_dir, str(s))
        removed.append(s)
        if dry:
            print(f'[dry] would remove {path}')
        else:
            shutil.rmtree(path)
    return sorted(keep), removed


def main():
    ap = argparse.ArgumentParser(description='Prune work dirs')
    ap.add_argument('--workdir', default='work_dirs')
    ap.add_argument('--num-keep', default=3, type=int)
    ap.add_argument('--keep-method', default='uniform',
                    choices=['uniform', 'last'])
    ap.add_argument('--dry', action='store_true')
    args = ap.parse_args()
    assert args.num_keep >= 1

    for run in sorted(os.listdir(args.workdir)):
        run_dir = os.path.join(args.workdir, run)
        if not os.path.isdir(run_dir):
            continue
        kept, removed = prune_run_dir(run_dir, args.num_keep,
                                      args.keep_method, args.dry)
        print(f'{run}: kept {kept}, removed {removed}')


if __name__ == '__main__':
    main()

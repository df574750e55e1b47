#!/usr/bin/env python
"""Plot training curves from the jsonl log (counterpart of the fork's
plot_log_json.py).

Usage: python tools/analysis/plot_log_json.py LOG.jsonl [--keys loss ...]
       [--out curves.png]
"""
import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('log')
    ap.add_argument('--keys', nargs='*', default=None)
    ap.add_argument('--out', default='curves.png')
    args = ap.parse_args()
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    records = []
    with open(args.log) as f:
        for line in f:
            line = line.strip()
            if line:
                try:
                    records.append(json.loads(line))
                except json.JSONDecodeError:
                    continue
    records = [r for r in records if isinstance(r, dict)]
    keys = args.keys
    if not keys:
        keys = sorted({k for r in records for k, v in r.items()
                       if isinstance(v, (int, float))
                       and k not in ('epoch', 'iter', 'step', 'time')})
    fig, axes = plt.subplots(len(keys), 1, figsize=(8, 3 * len(keys)),
                             squeeze=False)
    for ax, key in zip(axes[:, 0], keys):
        xs, ys = [], []
        for i, r in enumerate(records):
            if key in r:
                xs.append(r.get('step', r.get('iter', i)))
                ys.append(r[key])
        ax.plot(xs, ys)
        ax.set_title(key)
        ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=100)
    print(f'{len(keys)} curves -> {args.out}')


if __name__ == '__main__':
    main()

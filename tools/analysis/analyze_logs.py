#!/usr/bin/env python
"""Training-log analysis (counterpart of reference
tools/analysis/analyze_logs.py): summarize timing or plot metric curves
from train.log.json files.

Usage:
  python tools/analysis/analyze_logs.py cal_train_time LOG [LOG...]
  python tools/analysis/analyze_logs.py plot_curve LOG --keys heatmap_loss \
      [--out curve.png]
"""
import argparse
import json


def load_records(path):
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def cal_train_time(paths):
    for p in paths:
        recs = [r for r in load_records(p) if r.get('mode') == 'epoch']
        if not recs:
            print(f'{p}: no epoch records')
            continue
        times = [r['epoch_time'] for r in recs if 'epoch_time' in r]
        print(f'{p}: {len(recs)} epochs, mean epoch time '
              f'{sum(times) / max(len(times), 1):.1f}s')
        train = [r for r in load_records(p) if r.get('mode') == 'train'
                 and 'time' in r]
        if train:
            dt = [r.get('data_time', 0.0) for r in train]
            print(f'  data_time mean {sum(dt) / len(dt):.3f}s over '
                  f'{len(train)} logged iters')


def plot_curve(path, keys, out=None):
    recs = load_records(path)
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots()
    for key in keys:
        xs, ys = [], []
        for r in recs:
            if key in r and r.get('mode') in ('train', 'epoch'):
                xs.append(r.get('step', r.get('epoch', len(xs))))
                ys.append(r[key])
        ax.plot(xs, ys, label=key)
    ax.legend()
    ax.set_xlabel('step')
    if out:
        fig.savefig(out, dpi=120)
        print(f'wrote {out}')
    else:
        for key in keys:
            pts = sum(1 for r in recs
                      if key in r and r.get('mode') in ('train', 'epoch'))
            print(f'{key}: {pts} points')
        fig.savefig('plot_curve.png', dpi=120)
        print('wrote plot_curve.png')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('task', choices=['cal_train_time', 'plot_curve'])
    ap.add_argument('logs', nargs='+')
    ap.add_argument('--keys', nargs='*', default=['heatmap_loss'])
    ap.add_argument('--out', default=None)
    args = ap.parse_args()
    if args.task == 'cal_train_time':
        cal_train_time(args.logs)
    else:
        plot_curve(args.logs[0], args.keys, args.out)


if __name__ == '__main__':
    main()

#!/usr/bin/env python
"""Collect per-run TensorBoard event files into one central directory
(counterpart of the fork's update_tensorboard_logs.py:5-26, adapted to
this repo's work_dir layout where summaries live at <work_dir>/tb).

Usage:
    python tools/misc/update_tensorboard_logs.py [workdir] [tf_logs]
"""
import os
import shutil
import sys


def main(workdir='work_dirs', tf_logs='tensorboard_logs'):
    os.makedirs(tf_logs, exist_ok=True)
    copied = 0
    for subdir in sorted(os.listdir(workdir)):
        tb_dir = os.path.join(workdir, subdir, 'tb')
        if not os.path.isdir(tb_dir):
            continue
        dest = os.path.join(tf_logs, subdir)
        os.makedirs(dest, exist_ok=True)
        for name in os.listdir(tb_dir):
            shutil.copy(os.path.join(tb_dir, name),
                        os.path.join(dest, name))
            copied += 1
    print(f'copied {copied} event files into {tf_logs}/')


if __name__ == '__main__':
    main(*sys.argv[1:3])

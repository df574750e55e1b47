#!/usr/bin/env python
"""Print a fully-resolved config (reference tools/analysis/print_config.py).

Usage: python tools/analysis/print_config.py CONFIG [--cfg-options k=v ...]
"""
import argparse
import os
import pprint
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('config')
    ap.add_argument('--cfg-options', nargs='*', default=[])
    args = ap.parse_args()
    from vitpose_tpu.utils.config import load_config, apply_options
    cfg = load_config(args.config)
    if args.cfg_options:
        cfg = apply_options(cfg, args.cfg_options)
    pprint.pprint(cfg, width=100)


if __name__ == '__main__':
    main()

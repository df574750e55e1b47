#!/usr/bin/env python
"""Launch a webcam application from a config file.

Counterpart of the reference tools/webcam/run_webcam.py: the config's
`runner` dict is passed straight to WebcamRunner, and --cfg-options
key=value pairs override entries (e.g. runner.camera_id=1).
"""
import argparse
import ast
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))


def parse_args():
    parser = argparse.ArgumentParser('Launch webcam runner')
    parser.add_argument(
        '--config',
        default=os.path.join(os.path.dirname(__file__), 'configs',
                             'examples', 'pose_estimation.py'))
    parser.add_argument(
        '--cfg-options', nargs='+', default=[],
        help='key=value overrides merged into the config, e.g. '
             'runner.camera_id=1 runner.synchronous=True')
    return parser.parse_args()


def _set_by_path(cfg: dict, dotted: str, value):
    keys = dotted.split('.')
    node = cfg
    for k in keys[:-1]:
        node = node[k]
    node[keys[-1]] = value


def launch():
    args = parse_args()
    from vitpose_tpu.utils.config import load_config
    from vitpose_tpu.webcam import WebcamRunner

    cfg = load_config(args.config)
    for opt in args.cfg_options:
        key, _, raw = opt.partition('=')
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        _set_by_path(cfg, key, value)

    runner = WebcamRunner(**cfg['runner'])
    runner.run()


if __name__ == '__main__':
    launch()

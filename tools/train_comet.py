#!/usr/bin/env python
"""Training CLI with experiment-tracker integration (counterpart of the
fork's tools/train_comet.py — which is tools/train.py packaged for
comet-ml-tracked cluster runs without the PATH_TO_DATA substitution).

If `comet_ml` is importable an Experiment is created and the config +
per-step train.log.json records are streamed to it; otherwise training
proceeds with the standard jsonl/TensorBoard logging only.

Usage: identical to tools/train.py.
"""
import importlib.util
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

if os.environ.get('JAX_PLATFORMS'):
    import jax
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])


def _load_train_cli():
    path = os.path.join(os.path.dirname(__file__), 'train.py')
    spec = importlib.util.spec_from_file_location('vitpose_tools_train',
                                                  path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _make_experiment():
    try:
        import comet_ml
    except ImportError:
        print('comet_ml not installed; falling back to jsonl/TensorBoard '
              'logging only')
        return None
    return comet_ml.Experiment(
        project_name=os.environ.get('COMET_PROJECT_NAME', 'vitpose_tpu'))


def _tail_log_to_comet(experiment, log_path, stop_event):
    """Stream train.log.json records into comet as they are written.

    Reads in binary from the last byte offset (f.tell() during text-mode
    iteration raises OSError) and keeps any trailing partial line in a
    buffer; after stop is requested one final drain pass uploads the
    records written since the previous poll."""
    pos = 0
    buf = b''
    while True:
        stopping = stop_event.is_set()
        if os.path.exists(log_path):
            with open(log_path, 'rb') as f:
                f.seek(pos)
                buf += f.read()
                pos = f.tell()
            lines = buf.split(b'\n')
            buf = lines.pop()          # '' on complete final line
            for line in lines:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                step = rec.get('step', rec.get('epoch', 0))
                metrics = {k: v for k, v in rec.items()
                           if isinstance(v, (int, float))
                           and k not in ('step', 'epoch', 'iter')}
                if metrics:
                    experiment.log_metrics(metrics, step=int(step))
        if stopping:
            return
        stop_event.wait(5.0)


def main():
    tcli = _load_train_cli()
    experiment = _make_experiment()
    if experiment is None:
        tcli.main()
        return

    # resolve work_dir the way train_model does: CLI --work-dir, else the
    # config's runtime.work_dir, else the literal 'work_dir'
    # (vitpose_tpu/train/loop.py work_dir resolution)
    argv = sys.argv[1:]
    work_dir = None
    for i, a in enumerate(argv):
        if a == '--work-dir' and i + 1 < len(argv):
            work_dir = argv[i + 1]
        elif a.startswith('--work-dir='):
            work_dir = a.split('=', 1)[1]
    if work_dir is None and argv and os.path.exists(argv[0]):
        try:
            from vitpose_tpu.utils.config import load_config, apply_options
            # honor --cfg-options runtime.work_dir=... with argparse
            # nargs='*' semantics (last occurrence wins; support both the
            # space-separated and '=' forms), the same way train.py will
            opts = None
            for i, a in enumerate(argv):
                if a == '--cfg-options':
                    opts = []
                    j = i + 1
                    while j < len(argv) and not argv[j].startswith('--'):
                        opts.append(argv[j])
                        j += 1
                elif a.startswith('--cfg-options='):
                    opts = [a.split('=', 1)[1]]
            cfg = apply_options(load_config(argv[0]), opts or [])
            work_dir = cfg.get('runtime', {}).get('work_dir', 'work_dir')
        except Exception:
            work_dir = 'work_dir'

    experiment.log_parameters({'argv': ' '.join(argv)})
    if argv and os.path.exists(argv[0]):
        experiment.log_asset(argv[0])

    stop = threading.Event()
    tailer = None
    if work_dir:
        tailer = threading.Thread(
            target=_tail_log_to_comet,
            args=(experiment, os.path.join(work_dir, 'train.log.json'),
                  stop), daemon=True)
        tailer.start()
    try:
        tcli.main()
    finally:
        stop.set()
        if tailer:
            tailer.join(timeout=10)
        time.sleep(0.1)
        experiment.end()


if __name__ == '__main__':
    main()

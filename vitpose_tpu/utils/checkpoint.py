"""Orbax checkpointing: save/restore TrainState, best-metric tracking, resume.

Replaces mmcv's CheckpointHook + resume machinery (reference:
default_runtime.py:1 `checkpoint_config`, apis/train.py:196-199,
mmcv_custom/checkpoint.py:490 `save_checkpoint`). Checkpoints carry
{params, batch_stats, opt_state, step, epoch, meta}; `save_best` mirrors the
reference EvalHook's best-AP tracking (core/evaluation/eval_hooks.py).
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np


def _fetch_to_host(tree):
    """Tree of (possibly globally-sharded) jax.Arrays -> host numpy.
    Multi-host: collective allgather (every process must call this — a
    lone np.asarray on sharded params raises on non-addressable shards)."""
    if jax.process_count() == 1:
        return jax.tree.map(np.asarray, tree)
    from jax.experimental import multihost_utils
    return jax.tree.map(
        lambda x: np.asarray(multihost_utils.process_allgather(
            x, tiled=True)), tree)


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


# metrics where smaller is better (reference eval_hooks.py:7-10
# greater/less key lists)
_LESS_IS_BETTER = ('NME', 'EPE', 'MPJPE', 'P-MPJPE', 'N-MPJPE', 'loss')


class CheckpointManager:
    def __init__(self, directory, max_to_keep=3, save_best_metric='AP',
                 mode=None):
        ocp = _ocp()
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )
        self.save_best_metric = save_best_metric
        if mode is None:
            mode = ('min' if any(save_best_metric.startswith(m)
                                 for m in _LESS_IS_BETTER) else 'max')
        self.mode = mode
        self.best_value = np.inf if mode == 'min' else -np.inf
        self._meta_path = os.path.join(self.directory, 'meta.json')
        self._best_path = os.path.join(self.directory, 'best.npz')
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                meta = json.load(f)
            # only adopt a stored best when it tracked the SAME metric —
            # a work_dir switched from AP (max) to e.g. NME (min) must
            # start fresh, not compare incomparable values
            if meta.get('metric', self.save_best_metric) == \
                    self.save_best_metric:
                self.best_value = meta.get('best_value', self.best_value)

    def save(self, epoch, state, metrics: Optional[dict] = None, meta=None):
        ocp = _ocp()
        payload = {
            'params': state.params,
            'batch_stats': state.batch_stats,
            'opt_state': state.opt_state,
            'step': state.step,
        }
        self.mgr.save(epoch, args=ocp.args.StandardSave(payload))
        self.mgr.wait_until_finished()
        # the better-or-not decision and the (collective) host fetch of
        # the best weights run on EVERY process — metrics are identical
        # across processes, and globally-sharded params cannot be
        # np.asarray'd by one process alone (non-addressable shards)
        best_weights = None
        best_v = None
        if metrics and self.save_best_metric in metrics:
            v = float(metrics[self.save_best_metric])
            better = v < self.best_value if self.mode == 'min' \
                else v > self.best_value
            if better:
                self.best_value = v
                best_v = v
                best_weights = {
                    'params': _fetch_to_host(state.params),
                    'batch_stats': _fetch_to_host(state.batch_stats),
                }
        # host-side json/best writes happen on ONE process only — in a
        # multi-host run every process calls save() (the orbax save is
        # collective) and concurrent writes to a shared work_dir would
        # corrupt the jsons
        if jax.process_index() != 0:
            return
        info = {'epoch': epoch, 'meta': meta or {},
                'metrics': {k: float(v) for k, v in (metrics or {}).items()}}
        with open(os.path.join(self.directory, f'info_{epoch}.json'),
                  'w') as f:
            json.dump(info, f)
        if best_weights is not None:
            # persist the best WEIGHTS separately: orbax max_to_keep
            # retains only the newest steps, so the best epoch's
            # checkpoint would otherwise be garbage-collected
            save_params_npz(self._best_path, best_weights)
            with open(self._meta_path, 'w') as f:
                json.dump({'best_value': best_v, 'best_epoch': epoch,
                           'metric': self.save_best_metric,
                           'mode': self.mode,
                           'best_weights': self._best_path}, f)

    def latest_epoch(self):
        return self.mgr.latest_step()

    def load_info(self, epoch):
        """The info json written alongside checkpoint `epoch` (contains
        'meta' — e.g. completed=False for a mid-epoch preemption save) or
        None."""
        path = os.path.join(self.directory, f'info_{epoch}.json')
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def restore_best(self):
        """The separately-persisted best weights ({params, batch_stats}
        variables dict), or None if no best was recorded yet."""
        if not os.path.exists(self._best_path):
            return None
        return load_params_npz(self._best_path)

    def restore(self, state, epoch=None):
        """Restore into the structure of `state`; returns (state, epoch)."""
        ocp = _ocp()
        epoch = epoch if epoch is not None else self.mgr.latest_step()
        if epoch is None:
            return state, None
        template = {
            'params': state.params,
            'batch_stats': state.batch_stats,
            'opt_state': state.opt_state,
            'step': state.step,
        }
        restored = self.mgr.restore(
            epoch, args=ocp.args.StandardRestore(template))
        state = state.replace(params=restored['params'],
                              batch_stats=restored['batch_stats'],
                              opt_state=restored['opt_state'],
                              step=restored['step'])
        return state, epoch


def save_params_npz(path, variables):
    """Flat .npz export of params+batch_stats (simple interchange format)."""
    flat = {}

    def visit(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                visit(f'{prefix}/{k}' if prefix else k, v)
        else:
            flat[prefix] = np.asarray(tree)

    for top, tree in variables.items():
        visit(top, tree)
    np.savez(path, **flat)


def load_params_npz(path):
    """Inverse of save_params_npz -> nested variables dict."""
    data = np.load(path)
    out = {}
    for key in data.files:
        parts = key.split('/')
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return out

"""Device mesh + sharding rules (data / expert axes).

TPU-native replacement for the reference's NCCL data parallelism
(reference: apis/train.py:129 `MMDistributedDataParallel` wrapping,
core/utils/dist_utils.py:32 `allreduce_grads`, tools/dist_train.sh). Instead
of one process per GPU with bucketed gradient all-reduce, we lay out a
`jax.sharding.Mesh` with axes:

  * ``data``   — batch dimension; XLA emits the gradient psum over ICI.
  * ``expert`` — the stacked MoE expert axis [E, hidden, part]; true expert
    parallelism where the reference replicates every expert on every rank
    (vit_moe.py:107-111).
  * ``model``  — Megatron-style FFN tensor parallelism: fc1 kernels shard
    on the hidden (output) dim, fc2 kernels on the hidden (input) dim, so
    the GELU runs on hidden shards and XLA inserts one psum after fc2.
    The MoE stacked expert tensors shard on BOTH expert and hidden axes
    ([E, hidden, part] -> P('expert', 'model', None)). The attention
    qkv/proj stay replicated (packed-qkv reshape does not factor cleanly
    over heads; FFNs carry 2/3 of the block FLOPs).

Everything else is replicated (ViTPose-H is ~0.6B params and fits per chip;
optionally shard optimizer state later). The train step is jitted with these
shardings; collectives are compiler-inserted, never hand-written.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_expert: int = 1,
              n_model: int = 1, devices=None):
    """Create a (data, expert[, model]) mesh over the available devices.

    With n_model == 1 the mesh keeps the two-axis (data, expert) layout for
    backward compatibility; n_model > 1 adds the FFN tensor-parallel axis.
    """
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // (n_expert * n_model)
    if n_data * n_expert * n_model != n_total:
        raise ValueError(
            f'mesh axes data={n_data} x expert={n_expert} x '
            f'model={n_model} must factor the device count {n_total}')
    if n_model == 1:
        arr = np.asarray(devices).reshape(n_data, n_expert)
        return Mesh(arr, ('data', 'expert'))
    arr = np.asarray(devices).reshape(n_data, n_expert, n_model)
    return Mesh(arr, ('data', 'expert', 'model'))


def _divisible(leaf, spec, mesh_shape):
    """True iff the leaf's rank matches the spec and every named axis
    divides the corresponding dim."""
    if getattr(leaf, 'ndim', None) != len(spec):
        return False
    return all(ax is None or leaf.shape[i] % mesh_shape.get(ax, 1) == 0
               for i, ax in enumerate(spec))


def _tp_spec(keys, leaf, mesh_shape):
    """FFN tensor-parallel PartitionSpec for a param path, or None.

    Megatron sharding over the `model` axis: fc1 [D, hidden] splits the
    hidden output dim, fc2 [hidden, D] the hidden input dim; biases follow
    their layer's output dim. MoE expert tensors [E, hidden, part] combine
    expert x model sharding.
    """
    if len(keys) < 2 or 'mlp' not in keys:
        return None
    layer, name = keys[-2], keys[-1]
    nd = getattr(leaf, 'ndim', 0)
    if layer == 'fc1' and name == 'kernel' and nd == 2:
        spec = P(None, 'model')
    elif layer == 'fc1' and name == 'bias' and nd == 1:
        spec = P('model')
    elif layer == 'fc2' and name == 'kernel' and nd == 2:
        spec = P('model', None)
    elif name == 'expert_kernel' and nd == 3:
        spec = P('expert', 'model', None)
    else:
        return None
    # adam mu/nu mirror param shapes, but optax also carries scalar-shaped
    # leaves under the same paths; only shard when every named axis divides
    # its dim
    return spec if _divisible(leaf, spec, mesh_shape) else None


def _param_spec_for(mesh: Mesh):
    """The single param-placement rule shared by param_shardings and
    shard_state: expert tensors over `expert` (only when dim 0 divides the
    axis), FFN kernels over `model` (_tp_spec), everything else
    replicated."""
    has_expert_axis = mesh.shape.get('expert', 1) > 1
    has_model_axis = mesh.shape.get('model', 1) > 1
    n_expert = mesh.shape.get('expert', 1)

    def spec_for(path, leaf):
        keys = [getattr(p, 'key', str(p)) for p in path]
        if has_model_axis:
            tp = _tp_spec(keys, leaf, mesh.shape)
            if tp is not None:
                return NamedSharding(mesh, tp)
        if (has_expert_axis and keys
                and keys[-1].startswith('expert_')
                and getattr(leaf, 'ndim', 0) >= 1
                and leaf.shape[0] % n_expert == 0):
            return NamedSharding(mesh, P('expert'))
        return NamedSharding(mesh, P())

    return spec_for


def param_shardings(mesh: Mesh, params):
    """Replicate all params except stacked MoE expert tensors (sharded over
    `expert`) and, on meshes with a `model` axis, the FFN kernels
    (Megatron tensor parallelism, see _tp_spec)."""
    return jax.tree_util.tree_map_with_path(_param_spec_for(mesh), params)


def batch_shardings(mesh: Mesh, batch):
    """Shard every batch array along its leading dim over `data`."""
    def spec_for(leaf):
        if hasattr(leaf, 'ndim') and leaf.ndim >= 1:
            return NamedSharding(mesh, P('data'))
        return NamedSharding(mesh, P())
    return jax.tree.map(spec_for, batch)


def replicate(mesh: Mesh, tree):
    """Place a pytree fully replicated on the mesh."""
    return jax.device_put(
        tree, NamedSharding(mesh, P()))


def _zero1_spec(leaf, n_data):
    """ZeRO-1: shard an optimizer-moment leaf over `data` on its first
    divisible dim (mu/nu only live on the optimizer, so this spreads the
    2x-params adam memory across the data-parallel group; XLA gathers
    shards where the update needs them)."""
    shape = getattr(leaf, 'shape', ())
    for i, d in enumerate(shape):
        if d % n_data == 0 and d >= n_data:
            spec = [None] * len(shape)
            spec[i] = 'data'
            return P(*spec)
    return None


def shard_state(mesh: Mesh, state, zero1: bool = False):
    """Place a TrainState on the mesh: expert tensors sharded over `expert`
    (the same path rule applies to adam mu/nu, whose trees mirror params),
    FFN kernels over `model` when the mesh has that axis (_tp_spec),
    everything else replicated. ``zero1=True`` additionally shards the
    optimizer moments over `data` (ZeRO stage 1; the reference has no
    counterpart — SURVEY §2.6 FSDP row)."""
    spec_for = _param_spec_for(mesh)
    n_data = mesh.shape.get('data', 1)

    def opt_spec_for(path, leaf):
        base = spec_for(path, leaf)
        if not zero1 or n_data <= 1:
            return base
        if base.spec != P():
            return base                      # expert/tp sharding wins
        z = _zero1_spec(leaf, n_data)
        return NamedSharding(mesh, z) if z is not None else base

    def place(tree, spec_fn=None):
        specs = jax.tree_util.tree_map_with_path(spec_fn or spec_for, tree)
        # one device_put over matching pytrees batches the transfers
        return jax.device_put(tree, specs)

    return state.replace(
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
        params=place(state.params),
        batch_stats=place(state.batch_stats),
        opt_state=place(state.opt_state, opt_spec_for),
    )


def data_parallel_step(step_fn, mesh: Mesh, n_args, batch_argnums,
                       donate_argnums=()):
    """Jit an aux-family train step over the mesh's `data` axis.

    The reference trains EVERY family under DDP (apis/train.py:129,
    tools/dist_train.sh), not just the flagship; this is the mesh
    equivalent for loops whose step signature is not TrainState-shaped
    (bottom-up AE, pose lifter, ...): the args listed in ``batch_argnums``
    shard on their leading dim over `data`, everything else (params,
    optimizer state, rng keys, scalars) is replicated, and XLA inserts the
    gradient psum. Outputs are pinned replicated so parameters never come
    back data-sharded.

    Returns (jitted_fn, place_batch) — place_batch commits a batch pytree
    with the data sharding (every leaf's leading dim must divide the
    mesh's `data` size; pick n_data = gcd(batch, devices) upstream).
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P('data'))
    batch_argnums = set(batch_argnums)
    in_shardings = tuple(data if i in batch_argnums else repl
                         for i in range(n_args))
    jitted = jax.jit(step_fn, in_shardings=in_shardings,
                     out_shardings=repl, donate_argnums=donate_argnums)

    if jax.process_count() > 1:
        def place_batch(batch):
            return jax.tree.map(
                lambda leaf: jax.make_array_from_process_local_data(
                    data, np.asarray(leaf)), batch)
    else:
        def place_batch(batch):
            return jax.device_put(batch, data)
    return jitted, place_batch


def shard_train_step(train_step, mesh: Mesh, state, sample_batch,
                     zero1: bool = False):
    """Jit a train step over the mesh.

    Inputs are committed with explicit shardings (state via
    :func:`shard_state`, batch over `data`); jit then propagates them, and
    the gradient psum over `data` / expert dispatch over `expert` are
    inserted by XLA — no hand-written collectives.

    Returns (jitted_step, sharded_state, place_batch_fn).
    """
    sharded_state = shard_state(mesh, state, zero1=zero1)
    batch_shard = batch_shardings(mesh, sample_batch)

    if jax.process_count() > 1:
        # multi-controller: each process holds only ITS loader shard, so
        # the local batch is this process's slice of a global batch of
        # local_batch * process_count (device_put would instead demand
        # identical global values on every process)
        def place_batch(batch):
            return jax.tree.map(
                lambda leaf, s: jax.make_array_from_process_local_data(
                    s, np.asarray(leaf)),
                batch, batch_shard)
    else:
        def place_batch(batch):
            return jax.device_put(batch, batch_shard)

    # pin the state layout on BOTH sides of the jit: without out_shardings
    # XLA is free to return e.g. ZeRO-1 params sharded over `data`, which
    # flips the committed layout and forces a re-trace/recompile on the
    # next step (and every forward thereafter all-gathers the params)
    state_shard = jax.tree.map(lambda leaf: leaf.sharding, sharded_state)
    repl = NamedSharding(mesh, P())
    jitted = jax.jit(train_step, donate_argnums=(0,),
                     in_shardings=(state_shard, batch_shard, repl),
                     out_shardings=(state_shard, repl))
    return jitted, sharded_state, place_batch

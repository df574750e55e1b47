"""Train state: params + BN stats + optimizer state as one pytree."""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, opt_state = self.tx.update(grads, self.opt_state,
                                            self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=params,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
            opt_state=opt_state,
        )


def create_train_state(model, rng, sample_batch, tx, expert_idx=None,
                       variables=None):
    """Initialize variables and optimizer state.

    ``variables``: pass a precomputed ``model.init`` result to skip the
    (second) full init — callers that already initialized to build the
    layer-decay optimizer reuse it. Models without TopDown's
    ``expert_idx``/``all_heads`` kwargs (e.g. PoseLifter) are initialized
    with the plain signature."""
    if variables is None:
        cfg = getattr(model, 'cfg', None)
        if cfg is not None and hasattr(cfg, 'num_extra_heads'):
            # init through every head so extra (associate) head params
            # materialize
            all_heads = cfg.num_extra_heads > 0
            variables = model.init(rng, sample_batch, train=False,
                                   expert_idx=expert_idx,
                                   all_heads=all_heads)
        else:
            variables = model.init(rng, sample_batch, train=False)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )

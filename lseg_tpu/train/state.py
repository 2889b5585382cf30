"""Training state: params + batch_stats + optimizer state as one pytree.

Replaces the Lightning module's implicit state (reference:
modules/lsegmentation_module.py). A flax struct dataclass so the whole
state shards/checkpoints as a pytree under pjit/orbax.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: Any
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=(
                new_batch_stats
                if new_batch_stats is not None
                else self.batch_stats
            ),
        )


def create_train_state(
    model, variables, tx: optax.GradientTransformation
) -> TrainState:
    import jax.numpy as jnp

    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )

"""Train state: params + BatchNorm running stats + optimizer state.

Optimizers match train_ISPRS.py:404-407: Adam(lr, beta1=0.9) or SGD(lr, momentum=0.8),
wrapped in optax.inject_hyperparams so the learning rate lives in the optimizer state
and can be overridden when resuming from a checkpoint (the reference's
K.set_value(model.optimizer.lr, ...) semantics, train_ISPRS.py:477-479).
"""

from typing import Any, Callable

import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )

    @property
    def learning_rate(self):
        return self.opt_state.hyperparams["learning_rate"]

    def override_learning_rate(self, lr):
        """Resume-time lr override (train_ISPRS.py:477-479)."""
        hp = dict(self.opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return self.replace(opt_state=self.opt_state._replace(hyperparams=hp))


def make_optimizer(name: str, learning_rate: float) -> optax.GradientTransformation:
    # NB: optax.flatten(adam) was measured (14.1 -> 8.8 ms standalone for the
    # 362-tensor update) but is a wash inside the full fused step (75.2 vs 75.8
    # patches/s) — XLA's scheduler already hides the per-tensor updates behind
    # other work, and flattening adds ravel/unravel passes. Kept unflattened
    # for per-tensor checkpoint compatibility.
    if name == "adam":
        return optax.inject_hyperparams(optax.adam)(
            learning_rate=learning_rate, b1=0.9
        )
    elif name == "sgd":
        return optax.inject_hyperparams(optax.sgd)(
            learning_rate=learning_rate, momentum=0.8
        )
    raise ValueError(f"unknown optimizer {name}")


def create_train_state(model, rng, input_shape, optimizer="adam", learning_rate=1e-3):
    """Initialize params/batch_stats and the optimizer.

    Init traces with the Pallas segment kernels disabled: variable shapes are
    identical either way, and compiling the eval-mode segment kernels just to
    initialize parameters costs minutes of Mosaic compile time at 512px+ (the
    kernels still compile where they are actually used — the train/eval step)."""
    from ..ops.pallas import convseg

    with convseg.disabled():
        variables = model.init(rng, jnp.zeros(input_shape, jnp.float32),
                               train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(optimizer, learning_rate)
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )

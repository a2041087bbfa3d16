"""Minimal SPMD training loop: TrainState + jitted step over the mesh.

Replaces the reference's PyTorch-Lightning/DDP training glue (``run.py``
Trainer, ``vlmo_utils.set_schedule``, NCCL backward all-reduce): one jitted
``train_step`` with params/opt-state replicated (or tensor-sharded) and the
batch sharded over the ``data`` axis — GSPMD inserts the gradient
all-reduce over ICI; donated buffers keep params in place.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any

    def tree_flatten(self):
        return (self.step, self.params, self.opt_state), None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


def create_train_state(params: Any, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))


def make_train_step(
    loss_fn: Callable[[Any, Dict, jax.Array], Tuple[jnp.ndarray, Dict]],
    tx: optax.GradientTransformation,
    donate: bool = True,
):
    """``loss_fn(params, batch, rng) -> (loss, metrics)`` -> jitted step.

    Under a mesh, pass sharded state/batch; the same compiled program runs
    1-device or N-device (GSPMD).
    """

    def step(state: TrainState, batch: Dict, rng: jax.Array):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, new_params, new_opt)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())

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
    needs_hessian: bool = False,
):
    """``loss_fn(params, batch, rng) -> (loss, metrics)`` -> jitted step.

    Under a mesh, pass sharded state/batch; the same compiled program runs
    1-device or N-device (GSPMD).

    ``needs_hessian=True`` drives second-order optimizers (``adahessian``):
    the step computes a one-sample Hutchinson Hessian diagonal via
    forward-over-reverse ``jvp`` — whose primal output IS the gradient, so
    no extra backward pass — and feeds it to ``tx.update(...,
    hess_diag=...)`` (an ``optax.GradientTransformationExtraArgs``).
    """

    def step(state: TrainState, batch: Dict, rng: jax.Array):
        if needs_hessian:
            grad_fn = jax.grad(
                lambda p: loss_fn(p, batch, rng), has_aux=True
            )
            leaves, treedef = jax.tree_util.tree_flatten(state.params)
            ks = jax.random.split(jax.random.fold_in(rng, 0x5EED), len(leaves))
            z = treedef.unflatten(
                [
                    jax.random.rademacher(k, l.shape, dtype=l.dtype)
                    for k, l in zip(ks, leaves)
                ]
            )
            (grads, metrics), (hz, _) = jax.jvp(
                grad_fn, (state.params,), (z,)
            )
            hess_diag = jax.tree.map(lambda zi, hzi: zi * hzi, z, hz)
            updates, new_opt = tx.update(
                grads, state.opt_state, state.params, hess_diag=hess_diag
            )
        else:
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, rng
            )
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, new_params, new_opt)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())

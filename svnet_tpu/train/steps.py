"""Jitted train/eval step factories.

One static XLA program per config: rotation mode, model shape, and batch
shape are all static; the only per-step traced inputs are the batch, the
RNG key, and the train state. Rotation augmentation runs on-device inside
the step (the reference also rotates on device in the train loop,
main_cls_dgcnn.py:168-178 — batched, not in the data loader).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from svnet_tpu import ops


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, *, params, batch_stats, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
        )

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def make_train_step(
    model,
    loss_fn: Callable,
    rot: str = "aligned",
    with_label: bool = False,
    fused_apply: Optional[Callable] = None,
):
    """Build a jittable train step.

    batch: dict with 'points' (B, N, 3), 'target' (B,) or (B, N), and
    optionally 'label' (B, 16) one-hot category (partseg).
    loss_fn(outputs, target) -> scalar.
    ``fused_apply(params, batch_stats, points, rng) -> (outputs,
    new_batch_stats)`` replaces model.apply with the fused Pallas train
    forward (train/fused.py) when provided.
    """

    def step(state: TrainState, batch, rng):
        rot_rng, drop_rng = jax.random.split(rng)
        points = ops.apply_rotation_aug(rot_rng, batch["points"], rot)

        def loss_wrapped(params):
            if fused_apply is not None:
                f_args = (
                    (points, batch["label"]) if with_label else (points,)
                )
                outputs, new_stats = fused_apply(
                    params, state.batch_stats, *f_args, drop_rng
                )
                loss = loss_fn(outputs, batch["target"])
                return loss, (outputs, new_stats)
            args = (points, batch["label"]) if with_label else (points,)
            outputs, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                *args,
                True,
                mutable=["batch_stats"],
                rngs={"dropout": drop_rng},
            )
            loss = loss_fn(outputs, batch["target"])
            return loss, (outputs, updates["batch_stats"])

        (loss, (outputs, new_stats)), grads = jax.value_and_grad(
            loss_wrapped, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads, new_stats)
        logits = outputs[0] if isinstance(outputs, tuple) else outputs
        preds = jnp.argmax(logits, axis=-1)
        return new_state, loss, preds

    return step


def make_recal_step(
    model,
    rot: str = "aligned",
    with_label: bool = False,
    fused_apply: Optional[Callable] = None,
):
    """BN running-stats re-estimation step: a train-mode forward at FIXED
    weights that only advances the batch_stats EMA. Binary nets need this
    before eval — weight-sign flips shift activation distributions faster
    than the EMA tracks them (see --bn-reestimate)."""

    def step(params, batch_stats, batch, rng):
        rot_rng, drop_rng = jax.random.split(rng)
        points = ops.apply_rotation_aug(rot_rng, batch["points"], rot)
        args = (points, batch["label"]) if with_label else (points,)
        if fused_apply is not None:
            _, new_stats = fused_apply(params, batch_stats, *args, drop_rng)
            return new_stats
        _, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            *args,
            True,
            mutable=["batch_stats"],
            rngs={"dropout": drop_rng},
        )
        return updates["batch_stats"]

    return step


def make_eval_step(
    model,
    loss_fn: Callable,
    rot_test: str = "so3",
    with_label: bool = False,
):
    def step(params, batch_stats, batch, rng):
        points = ops.apply_rotation_aug(rng, batch["points"], rot_test)
        args = (points, batch["label"]) if with_label else (points,)
        outputs = model.apply(
            {"params": params, "batch_stats": batch_stats}, *args, False
        )
        loss = loss_fn(outputs, batch["target"])
        logits = outputs[0] if isinstance(outputs, tuple) else outputs
        preds = jnp.argmax(logits, axis=-1)
        return loss, preds

    return step

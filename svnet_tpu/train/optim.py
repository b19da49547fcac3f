"""Optimizers and LR schedules, matching the reference's training recipes.

Rules (SURVEY.md §2.8):
  * DGCNN drivers: FP -> SGD(lr*100, momentum 0.9, wd) + cosine annealing to
    eta_min=lr; binary -> Adam(lr, wd) + cosine to 0
    (ref main_cls_dgcnn.py:88,128-135).
  * PointNet cls driver: always Adam + StepLR(step=20, gamma=0.7)
    (ref main_cls_pointnet.py:128-130).
  * PointNet partseg driver: Adam + manual stepped lr*0.5^(epoch//20)
    clipped at 1e-5 (ref main_partseg_pointnet.py:142-148).

torch weight-decay semantics (L2 added to the gradient BEFORE the momentum /
Adam moments) are reproduced with add_decayed_weights placed before the
scaling transform.
"""

from __future__ import annotations

import math
from typing import Callable

import optax


def cosine_schedule(lr0: float, epochs: int, steps_per_epoch: int, eta_min: float = 0.0):
    """torch CosineAnnealingLR stepped per-epoch: lr_t = eta_min +
    (lr0 - eta_min) * (1 + cos(pi * epoch / T)) / 2."""

    import jax.numpy as jnp

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return eta_min + (lr0 - eta_min) * 0.5 * (
            1 + jnp.cos(jnp.pi * epoch / epochs)
        )

    return schedule


def step_schedule(lr0: float, steps_per_epoch: int, step_size: int = 20, gamma: float = 0.7):
    """torch StepLR stepped per-epoch."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return lr0 * gamma ** (epoch // step_size)

    return schedule


def manual_clip_schedule(lr0: float, steps_per_epoch: int, gamma: float = 0.5,
                         step_size: int = 20, floor: float = 1e-5):
    """ref main_partseg_pointnet.py:142-148: lr*0.5^(epoch//20), min 1e-5."""
    import jax.numpy as jnp

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return jnp.maximum(lr0 * gamma ** (epoch // step_size), floor)

    return schedule


def make_optimizer(
    *,
    binary: bool,
    lr: float,
    epochs: int,
    steps_per_epoch: int,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    recipe: str = "dgcnn",
    opt: str = "auto",
) -> optax.GradientTransformation:
    """Build the optimizer for a given driver recipe ('dgcnn', 'pointnet_cls',
    'pointnet_partseg').

    ``opt`` (r4): 'auto' keeps the reference's hardwired choice (DGCNN:
    Adam for binary, SGD(lr x 100) for FP — main_cls_dgcnn.py:88,128);
    'adam'/'sgd' force one. The reference gives no way to choose (its
    use_sgd flag is overwritten from --binary); exposing it matters when
    the epoch budget is far below the reference's ~200-epoch runs — the
    SGD-cosine FP recipe converges too slowly for short budgets while
    Adam tracks it (measured on the synthetic partseg benchmark,
    ACCURACY.md r4)."""
    if recipe == "dgcnn":
        use_adam = binary if opt == "auto" else (opt == "adam")
        if use_adam:
            sched = cosine_schedule(lr, epochs, steps_per_epoch, eta_min=0.0)
            return optax.chain(
                optax.add_decayed_weights(weight_decay),
                optax.scale_by_adam(),
                optax.scale_by_learning_rate(sched),
            )
        sched = cosine_schedule(lr * 100, epochs, steps_per_epoch, eta_min=lr)
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.trace(decay=momentum, nesterov=False),
            optax.scale_by_learning_rate(sched),
        )
    if recipe == "pointnet_cls":
        sched = step_schedule(lr, steps_per_epoch)
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(sched),
        )
    if recipe == "pointnet_partseg":
        sched = manual_clip_schedule(lr, steps_per_epoch)
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(sched),
        )
    raise ValueError(f"unknown recipe {recipe!r}")

"""Loss functions. Capability parity with reference utils.py:33-65."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cal_loss(
    logits: jax.Array, target: jax.Array, smoothing: bool = True
) -> jax.Array:
    """Cross-entropy with label smoothing eps=0.2 (default on).

    ref utils.py:33-50. logits (..., C), target (...,) int.
    The smoothed distribution is (1-eps) on the target and eps/(C-1) spread
    over the other classes (NOT eps/C — matches the reference exactly).
    """
    n_class = logits.shape[-1]
    logits = logits.reshape(-1, n_class)
    target = target.reshape(-1)
    log_prb = jax.nn.log_softmax(logits, axis=-1)
    if smoothing:
        eps = 0.2
        one_hot = jax.nn.one_hot(target, n_class, dtype=logits.dtype)
        soft = one_hot * (1 - eps) + (1 - one_hot) * eps / (n_class - 1)
        return -(soft * log_prb).sum(axis=-1).mean()
    nll = -jnp.take_along_axis(log_prb, target[:, None], axis=-1)
    return nll.mean()


def feature_transform_regularizer(trans: jax.Array) -> jax.Array:
    """|| T T^t - I ||_F mean over batch. ref utils.py:53-57.

    (The reference computes norm(T @ (T^t - I)) due to operator precedence —
    ``torch.bmm(trans, trans.transpose(2,1) - I)`` — we reproduce that exact
    expression for parity.)
    """
    d = trans.shape[1]
    eye = jnp.eye(d, dtype=trans.dtype)
    prod = jnp.einsum("bij,bjk->bik", trans, jnp.swapaxes(trans, 1, 2) - eye)
    return jnp.sqrt(jnp.sum(prod * prod, axis=(1, 2))).mean()


def cal_pointnet_loss(outputs, target) -> jax.Array:
    """CE + 0.001 * T-Net orthogonality regularizer. ref utils.py:59-65."""
    logits, trans_feat = outputs
    return cal_loss(logits, target) + 0.001 * feature_transform_regularizer(
        trans_feat
    )

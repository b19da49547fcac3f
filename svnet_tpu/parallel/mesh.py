"""Device mesh + sharding helpers.

Parallelism layout:
  * 'data' axis: batch sharding (the reference's only parallelism, as
    nn.DataParallel — ref main_cls_dgcnn.py:125). Gradients and batchnorm
    batch statistics are globally reduced by XLA (psum over ICI), which is
    the mathematically-synchronous upgrade of DataParallel's per-replica BN.
  * 'model' axis (optional): Megatron-style column parallelism for wide
    kernels — any 2D kernel whose output dim divides the axis size and is
    >= the threshold is sharded on its last axis; everything else is
    replicated. XLA inserts the all-gathers/reduce-scatters.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    data: Optional[int] = None,
    model: int = 1,
    devices=None,
) -> Mesh:
    """Create a ('data', 'model') mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if data is None:
        data = n_devices // model
    assert data * model == n_devices, (data, model, n_devices)
    return Mesh(devices.reshape(data, model), ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis on 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_params_tp(params, mesh: Mesh, min_dim: int = 256):
    """Build a sharding pytree for params: column-parallel wide kernels on
    'model', everything else replicated.

    Returns a pytree of NamedSharding matching ``params``.
    """
    model_size = mesh.shape["model"]

    def rule(path, leaf):
        if (
            model_size > 1
            and leaf.ndim == 2
            and leaf.shape[-1] >= min_dim
            and leaf.shape[-1] % model_size == 0
        ):
            return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def put_params(params, shardings):
    """Device-put a param pytree onto its shardings."""
    return jax.tree_util.tree_map(jax.device_put, params, shardings)

"""Deformed-sphere surface clouds — the shared --surface generator.

Clustered real-surface geometry (NOT N(0,1) noise): unit-sphere samples
pushed by three random Gaussian bump fields. This is the shape family the
Morton candidate window and the approx fold are characterized on
(PERF.md); bench.py, tools/bench_rounds.py and the recall tests all draw
from this one implementation so their data distributions stay identical.
"""

from __future__ import annotations

import numpy as np


def surface_clouds(seed: int, B: int, N: int) -> np.ndarray:
    """(B, N, 3) float32 deformed-sphere surface clouds."""
    rng = np.random.default_rng(seed)
    clouds = []
    for _ in range(B):
        p = rng.normal(size=(N, 3))
        p /= np.linalg.norm(p, axis=1, keepdims=True)
        for _ in range(3):
            c = rng.normal(size=3)
            c /= np.linalg.norm(c)
            p += 0.15 * np.exp(
                -np.sum((p - c) ** 2, 1) / 0.3
            )[:, None] * (p - c)
        clouds.append(p.astype(np.float32))
    return np.stack(clouds)


def morton_sorted_surface_clouds(seed: int, B: int, N: int):
    """surface_clouds + Morton ordering (jax array), the serving layout
    for the candidate-window path."""
    import jax.numpy as jnp

    from svnet_tpu.ops.pallas.sv_round3 import morton_order

    pts = jnp.asarray(surface_clouds(seed, B, N))
    perm = morton_order(pts)
    return jnp.take_along_axis(pts, perm[..., None], axis=1)

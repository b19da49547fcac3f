"""On-device SO(3) / z-axis rotation augmentation.

The reference applies rotation augmentation on-device per batch in the train
loop via pytorch3d (main_cls_dgcnn.py:168-178): ``RotateAxisAngle`` for
``--rot z`` and ``Rotate(random_rotations(B))`` for ``--rot so3``.

pytorch3d's ``random_rotations`` draws uniform (Haar) rotations by normalizing
4 i.i.d. gaussians into a unit quaternion; we do the same with JAX PRNG.
pytorch3d's ``Transform3d.transform_points`` composes as a row-vector
right-multiply ``p' = p @ R``; we keep that convention (under Haar measure,
R and R^T are identically distributed, so the eval protocol matches).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quaternion_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion(s) (..., 4) [w, x, y, z] -> rotation matrices (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two = 2.0 / jnp.sum(q * q, axis=-1)
    m = jnp.stack(
        [
            1 - two * (y * y + z * z),
            two * (x * y - z * w),
            two * (x * z + y * w),
            two * (x * y + z * w),
            1 - two * (x * x + z * z),
            two * (y * z - x * w),
            two * (x * z - y * w),
            two * (y * z + x * w),
            1 - two * (x * x + y * y),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def random_rotations(key: jax.Array, n: int, dtype=jnp.float32) -> jax.Array:
    """n uniform (Haar) random rotation matrices, (n, 3, 3).

    Matches the distribution of pytorch3d.transforms.random_rotations.
    """
    q = jax.random.normal(key, (n, 4), dtype=dtype)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return quaternion_to_matrix(q)


def random_z_rotations(key: jax.Array, n: int, dtype=jnp.float32) -> jax.Array:
    """n random rotations about the z axis (uniform angle), (n, 3, 3).

    Matches RotateAxisAngle(angle=U(0,360), axis='Z') in the reference
    (main_cls_dgcnn.py:172).
    """
    theta = jax.random.uniform(key, (n,), dtype=dtype) * (2.0 * jnp.pi)
    c, s = jnp.cos(theta), jnp.sin(theta)
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    m = jnp.stack([c, -s, zeros, s, c, zeros, zeros, zeros, ones], axis=-1)
    return m.reshape(n, 3, 3)


def rotate_points(points: jax.Array, rot: jax.Array) -> jax.Array:
    """Apply per-cloud rotations: points (B, N, 3) @ rot (B, 3, 3) -> (B, N, 3).

    Row-vector convention, matching pytorch3d transform_points.
    """
    return jnp.einsum(
        "bni,bij->bnj", points, rot, precision=jax.lax.Precision.HIGHEST
    )


def apply_rotation_aug(key: jax.Array, points: jax.Array, mode: str) -> jax.Array:
    """Rotation augmentation dispatcher: mode in {'aligned', 'z', 'so3'}.

    ref protocol: main_cls_dgcnn.py:168-178 (train) / 226-234 (test).
    """
    if mode == "aligned":
        return points
    B = points.shape[0]
    if mode == "z":
        rot = random_z_rotations(key, B, dtype=points.dtype)
    elif mode == "so3":
        rot = random_rotations(key, B, dtype=points.dtype)
    else:
        raise ValueError(f"unrecognized rotation mode {mode!r}")
    return rotate_points(points, rot)

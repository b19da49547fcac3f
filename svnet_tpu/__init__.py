"""svnet_tpu — a TPU-native (JAX/XLA/Pallas) point-cloud framework.

A from-scratch rebuild of the capabilities of hellozhuo/svnet (SVNet, 3DV 2022):
SO(3)-equivariant point-cloud networks with two parallel feature streams per
point — rotation-invariant scalars ``s: (B, N, [k,] S)`` and rotation-equivariant
vectors ``v: (B, N, [k,] 3, V)`` — where the scalar stream can be binarized
(1-bit weights/activations, XNOR-popcount eval path).

Design stance (TPU-first, not a port):
  * channels-last layouts everywhere: ``(B, N, k, C)`` / ``(B, N, k, 3, C)``
  * functional flax.linen modules, explicit RNG keys, jitted train/eval steps
  * static shapes (fixed B, N, k) so every config compiles to one XLA program
  * data parallelism via ``jax.sharding.NamedSharding`` over a device mesh
  * Pallas kernels for the two ops XLA's defaults lose on: the kNN graph build
    and the bit-packed binary (±1) matmul eval path
"""

__version__ = "0.1.0"

from svnet_tpu import ops  # noqa: F401

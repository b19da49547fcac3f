"""Multi-device parallelism: mesh construction + sharding rules.

TPU-native replacement for the reference's nn.DataParallel (SURVEY.md §2.8,
§5.8): data parallelism (and optional tensor parallelism for the wide
linears) expressed as jax.sharding.NamedSharding over a Mesh; XLA inserts
the collectives (psum for grads/BN stats, all-gathers for tp) over ICI.
"""

from svnet_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_params_tp,
)
from svnet_tpu.parallel.ring_knn import ring_knn

"""AOT engine serialization for serving (jax.export).

A serving deployment should not retrace/recompile the engine per process:
``export_engine`` serializes the fused engine's jitted forward (StableHLO
+ the Pallas kernels' tpu_custom_calls) for fixed shapes; ``load_engine``
deserializes and calls it — no svnet_tpu model/param code needed at the
serving site beyond this module. The reference has no counterpart (its
deploy story is torch eval scripts); this is the TPU-native equivalent of
an exported inference graph.

Notes
- Shapes/dtypes are fixed at export: export per (B, N) serving
  configuration (engines are jitted per shape anyway).
- Engine parameters are baked into the artifact as constants.
- Pallas kernels lower to backend-specific custom calls, so the artifact
  is platform-locked (TPU artifacts serve on TPU; interpret-mode/CPU
  exports exist for tests). jax.export flags the custom calls as
  non-portable — we register them as intentional via DisabledSafetyCheck.
"""

from __future__ import annotations

import jax
from jax import export as _export


def _disabled_checks():
    return [
        _export.DisabledSafetyCheck.custom_call("tpu_custom_call"),
        _export.DisabledSafetyCheck.custom_call("Sharding"),
    ]


def export_engine(engine, *example_args) -> bytes:
    """Serialize an engine's forward for the example args' shapes/dtypes.

    ``engine``: any infer.py engine (uses its jitted ``_forward``).
    Returns the serialized artifact bytes; write them wherever your
    deployment stores binaries.
    """
    specs = tuple(
        jax.ShapeDtypeStruct(a.shape, a.dtype) for a in example_args
    )
    fn = jax.jit(engine._forward)
    exp = _export.export(fn, disabled_checks=_disabled_checks())(*specs)
    return exp.serialize()


def load_engine(blob: bytes):
    """Deserialize an exported engine; returns a callable(points, ...)."""
    exp = _export.deserialize(blob)
    return exp.call

"""Test configuration: force CPU with 8 virtual devices for multi-chip tests.

This is JAX's standard fake-multi-device mechanism (the TPU-world analogue of
a fake distributed backend): all sharding/collective code paths compile and
execute on 8 host devices without real chips.

Note: this image's sitecustomize registers a remote-TPU ("axon") backend and
force-sets jax_platforms at interpreter start, so the env var alone is not
enough — we must flip jax_platforms back after import, before any backend use.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

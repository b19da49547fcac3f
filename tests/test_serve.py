"""AOT export round-trip (svnet_tpu/serve.py).

CPU runs the engines' Pallas kernels in interpret mode, so the artifact
here serializes the interpreter program — the TPU path serializes
tpu_custom_calls instead (same API; exercised on-chip by the round's
bench queue). What this test pins down: the export API composes with the
engines, parameters bake into the artifact, and a deserialized call
reproduces the live engine bitwise.
"""

import jax
import jax.numpy as jnp
import numpy as np

from svnet_tpu import models
from svnet_tpu.infer import SVDGCNNClsEngine
from svnet_tpu.serve import export_engine, load_engine


def test_serve_cli_exports_checkpoint(tmp_path):
    """python -m svnet_tpu.serve: checkpoint -> AOT artifact end to end."""
    import subprocess
    import sys

    from flax import serialization

    model = models.SV_DGCNN_CLS(num_classes=10, k=8, binary=True)
    pts = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), pts)
    ckpt = tmp_path / "model_best.ckpt"
    ckpt.write_bytes(serialization.to_bytes({
        "epoch": 3,
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
        "best_metric": 0.5,
    }))
    out = tmp_path / "engine.aot"
    r = subprocess.run(
        [sys.executable, "-m", "svnet_tpu.serve", "--ckpt", str(ckpt),
         "--out", str(out), "--batch", "2", "--num-points", "128",
         "--k", "8", "--num-classes", "10", "--mode", "exact",
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    call = load_engine(out.read_bytes())
    eng = SVDGCNNClsEngine(
        variables, num_classes=10, k=8, binary=True,
        mode="exact", interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(call(pts)), np.asarray(jax.jit(eng._forward)(pts))
    )


def test_export_engine_roundtrip():
    B, N, k = 2, 128, 8
    model = models.SV_DGCNN_CLS(num_classes=10, k=k, binary=True)
    pts = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), pts)
    eng = SVDGCNNClsEngine(
        variables, num_classes=10, k=k, binary=True, tile=32,
        mode="exact", interpret=True,
    )
    want = np.asarray(jax.jit(eng._forward)(pts))

    blob = export_engine(eng, pts)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 0
    blob = bytes(blob)  # storable anywhere bytes are
    call = load_engine(blob)
    got = np.asarray(call(pts))
    np.testing.assert_array_equal(got, want)

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


def _main():
    """Export a trained checkpoint's fused engine to an AOT artifact.

    python -m svnet_tpu.serve --ckpt results/save_models/model_best.ckpt \
        --task cls --backbone dgcnn --batch 8 --num-points 1024 --k 20 \
        --mode fast --binary --out engine.aot
    """
    import argparse

    import jax.numpy as jnp
    from flax import serialization

    from svnet_tpu import config, models

    ap = argparse.ArgumentParser(description=_main.__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--task", choices=["cls", "partseg"], default="cls")
    ap.add_argument("--backbone", choices=["dgcnn", "pointnet"],
                    default="dgcnn")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--num-points", type=int, default=1024)
    ap.add_argument("--k", type=int, default=0)
    ap.add_argument("--num-classes", type=int, default=40)
    ap.add_argument("--num-part", type=int, default=50)
    ap.add_argument("--num-shape-classes", type=int, default=16,
                    help="partseg one-hot label width")
    ap.add_argument("--mode", choices=["exact", "fast", "approx"],
                    default="fast")
    ap.add_argument("--approx-fold", type=int, default=0)
    ap.add_argument("--fast-gather-bits", type=int, default=0,
                    choices=[0, 8, 16])
    ap.add_argument("--approx-gather-bits", type=int, default=0,
                    choices=[0, 8, 16])
    ap.add_argument("--graph-reuse", default="none",
                    choices=["none", "conv2", "spatial"])
    ap.add_argument("--fp", action="store_true",
                    help="full-precision weights (default binary)")
    ap.add_argument("--platform", default="",
                    help="force a jax platform (e.g. cpu for an "
                         "interpret-mode test artifact)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.approx_fold:
        config.set_approx_fold(args.approx_fold)
    if args.approx_gather_bits:
        config.set_approx_gather_bits(args.approx_gather_bits)
    if args.fast_gather_bits:
        config.set_fast_gather_bits(args.fast_gather_bits)
    if args.graph_reuse != "none":
        config.set_graph_reuse(args.graph_reuse)

    k = args.k or (20 if args.task == "cls" else 40)
    binary = not args.fp
    B, N = args.batch, args.num_points
    pts = jnp.zeros((B, N, 3), jnp.float32)
    if args.task == "cls":
        model = models.get_model("cls", args.backbone, "svnet",
                                 num_classes=args.num_classes, k=k,
                                 binary=binary)
        variables = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), pts)
        )
        example = (pts,)
    else:
        model = models.get_model("partseg", args.backbone, "svnet",
                                 num_part=args.num_part, k=k, binary=binary)
        lab = jnp.zeros((B, args.num_shape_classes), jnp.float32)
        variables = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), pts, lab)
        )
        example = (pts, lab)
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)
    # the proven restore-template shape (extra stored keys — opt_state —
    # are ignored; same pattern as the KD teacher preload in train/loop.py)
    template = {
        "epoch": 0,
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
        "best_metric": 0.0,
    }
    with open(args.ckpt, "rb") as f:
        restored = serialization.from_bytes(template, f.read())
    payload = {
        "params": restored["params"],
        "batch_stats": restored["batch_stats"],
    }

    from svnet_tpu import infer

    eng_cls = {
        ("cls", "dgcnn"): infer.SVDGCNNClsEngine,
        ("cls", "pointnet"): infer.SVPointNetClsEngine,
        ("partseg", "dgcnn"): infer.SVDGCNNPsegEngine,
        ("partseg", "pointnet"): infer.SVPointNetPsegEngine,
    }[(args.task, args.backbone)]
    kw = {"k": k, "binary": binary, "mode": args.mode}
    if args.task == "cls":
        kw["num_classes"] = args.num_classes
    else:
        kw["num_part"] = args.num_part
    eng = eng_cls(payload, **kw)
    blob = bytes(export_engine(eng, *example))
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {args.task}/{args.backbone} mode={args.mode} "
          f"B={B} N={N} -> {args.out} ({len(blob)} bytes)")


if __name__ == "__main__":
    _main()

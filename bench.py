"""Headline benchmark: SVNet-DGCNN binary inference throughput (clouds/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline is measured against the 50k clouds/s/chip North Star from
BASELINE.md (the reference publishes no throughput numbers of its own).

Methodology: the axon TPU tunnel adds ~26 ms fixed dispatch/fetch latency
and ~100 MB/s result transfer, so we time K data-dependent forwards inside
ONE jitted program and fetch a single scalar, subtracting the fixed
roundtrip. This measures on-device step time, which is what batch-serving
throughput is made of.

Honesty guard (VERDICT r1 weak #7): if the requested engine fails and the
bench falls back, the JSON carries ``engine_fallback: true`` and names the
engine actually measured — cross-round comparisons can detect/skip it.

Usage: python bench.py [--batch B] [--num-points N] [--k K] [--iters I]
                       [--engine fused|flax] [--mode exact|fast|approx]
"""

import argparse
import json
import statistics
import time

import jax
import jax.numpy as jnp

NORTH_STAR = 50_000.0  # clouds/s/chip, BASELINE.md
ROUNDTRIP_MS = 26.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--num-points", type=int, default=1024)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--engine", choices=["fused", "flax"], default="fused")
    ap.add_argument(
        "--mode", choices=["exact", "fast", "approx"], default="exact",
        help="exact: bit-exact f32 gather + f32-exact neighbour ordering; "
             "fast: 16-bit fixed-point gather + 18-bit quantized selection; "
             "approx: fast + folded-bin selection (recall ~0.96, PERF.md)",
    )
    ap.add_argument(
        "--fast", action="store_true",
        help="deprecated alias for --mode fast",
    )
    ap.add_argument(
        "--rounds-impl", choices=["round2", "round", "edge"], default="round2",
    )
    ap.add_argument(
        "--strict", action="store_true",
        help="fail instead of falling back to the flax engine",
    )
    args = ap.parse_args()
    if args.fast and args.mode == "exact":
        args.mode = "fast"

    from svnet_tpu import models
    from svnet_tpu.infer import SVDGCNNClsEngine

    model = models.SV_DGCNN_CLS(num_classes=40, k=args.k, binary=True)
    points = jax.random.normal(
        jax.random.PRNGKey(0), (args.batch, args.num_points, 3)
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), points)

    def make_timed(engine_kind):
        if engine_kind == "fused":
            eng = SVDGCNNClsEngine(
                variables, k=args.k, binary=True, mode=args.mode,
                rounds_impl=args.rounds_impl,
            )
            forward = eng._forward
        else:
            forward = lambda pts: model.apply(variables, pts, False)
        iters = args.iters

        @jax.jit
        def timed():
            def body(i, pts):
                out = forward(pts)
                return pts + 1e-12 * jnp.mean(out)

            pts = jax.lax.fori_loop(0, iters, body, points)
            return jnp.sum(forward(pts))

        return timed

    # the remote-TPU tunnel occasionally drops a dispatch; retry, and (unless
    # --strict) fall back to the plain XLA engine rather than report nothing
    times = None
    measured_engine = None
    fallbacks = [args.engine] if args.strict else [args.engine, "flax"]
    last_err = None
    for engine_kind in fallbacks:
        for attempt in range(3):
            try:
                timed = make_timed(engine_kind)
                float(timed())  # compile + warm
                times = []
                for _ in range(args.repeats):
                    t0 = time.perf_counter()
                    float(timed())
                    times.append(time.perf_counter() - t0)
                break
            except Exception as e:  # pragma: no cover - transient tunnel
                print(f"# bench attempt failed ({engine_kind}): {e}")
                last_err = e
                times = None
        if times is not None:
            measured_engine = engine_kind
            break
    if times is None:
        raise RuntimeError(f"all bench attempts failed: {last_err}")
    iters = args.iters

    total_ms = statistics.median(times) * 1e3
    per_fwd_ms = max((total_ms - ROUNDTRIP_MS) / (iters + 1), 1e-6)
    clouds_per_s = args.batch / (per_fwd_ms / 1e3)
    print(
        json.dumps(
            {
                "metric": "svnet_dgcnn_binary_inference",
                "value": round(clouds_per_s, 1),
                "unit": (
                    f"clouds/s/chip @ {args.num_points} pts "
                    f"(B={args.batch}, k={args.k}, engine={measured_engine}, "
                    f"mode={args.mode})"
                ),
                "vs_baseline": round(clouds_per_s / NORTH_STAR, 4),
                "engine": measured_engine,
                "mode": args.mode,
                "engine_fallback": measured_engine != args.engine,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Headline benchmark: SVNet-DGCNN binary inference throughput (clouds/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

The headline ``value`` is the SERVING mode (fast: 16-bit fixed-point gathers
+ quantized selection — identical test accuracy to exact on trained
checkpoints, ACCURACY.md), and the same line carries the exact-mode
(bit-exact f32 gather, f32-exact neighbour ordering) number under
``value_exact`` so the parity reference stays driver-captured too
(VERDICT r2 weak #2). ``vs_baseline`` keeps its r1/r2 meaning (ratio vs the
original 50k North Star) for cross-round comparability; ``vs_target`` is the
ratio vs BASELINE.md's derived reachable target for the serving mode.

Methodology: the axon TPU tunnel adds ~26 ms fixed dispatch/fetch latency
and ~100 MB/s result transfer, so we time K data-dependent forwards inside
ONE jitted program and fetch a single scalar, subtracting the fixed
roundtrip. This measures on-device step time, which is what batch-serving
throughput is made of.

Honesty guard (VERDICT r1 weak #7): if the requested engine fails and the
bench falls back, the JSON carries ``engine_fallback: true`` and names the
engine actually measured — cross-round comparisons can detect/skip it.

Usage: python bench.py [--task cls|partseg] [--batch B] [--num-points N]
                       [--k K] [--iters I] [--engine fused|flax]
                       [--modes fast,exact] [--mode exact|fast|approx]
"""

import argparse
import json
import statistics
import time

import jax
import jax.numpy as jnp

NORTH_STAR = 50_000.0  # clouds/s/chip, the original r1 target (BASELINE.md)
# derived reachable serving-mode target on v5e with exact-kNN semantics
# (PERF.md hard-floor ledger; renegotiation recorded in BASELINE.md)
TARGET = {"cls": 6_000.0, "partseg": 1_200.0}
ROUNDTRIP_MS = 26.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=["cls", "partseg"], default="cls")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--num-points", type=int, default=None)
    ap.add_argument("--k", type=int, default=None)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--engine", choices=["fused", "flax"], default="fused")
    ap.add_argument(
        "--modes", default="fast,exact",
        help="comma-separated engine modes to measure; the FIRST is the "
             "headline value, the rest are carried as value_<mode> keys",
    )
    ap.add_argument(
        "--mode", choices=["exact", "fast", "approx"], default=None,
        help="measure a single mode (overrides --modes)",
    )
    ap.add_argument(
        "--fast", action="store_true",
        help="deprecated alias for --mode fast",
    )
    ap.add_argument(
        "--rounds-impl", choices=["round3", "round2", "round", "edge"],
        default="round3",
    )
    ap.add_argument(
        "--arch", choices=["dgcnn", "pointnet"], default="dgcnn",
        help="model family (fused engines exist for both, cls and partseg)",
    )
    ap.add_argument(
        "--strict", action="store_true",
        help="fail instead of falling back to the flax engine",
    )
    ap.add_argument(
        "--window", type=int, default=0,
        help="Morton candidate-window width (round3; use with --surface)",
    )
    ap.add_argument(
        "--surface", action="store_true",
        help="bench on Morton-sorted deformed-sphere surface clouds "
             "instead of N(0,1) noise (block skipping only helps here)",
    )
    ap.add_argument(
        "--exact-selection", choices=["update", "pair", "fused", "value"], default=None,
        help="exact-mode top-k scheme A/B (config.set_exact_selection)",
    )
    ap.add_argument(
        "--gather-pipeline", action="store_true",
        help="software-pipeline chunk c+1's gather mask build against "
             "chunk c's MXU dot (config.set_gather_pipeline; bitwise-"
             "identical outputs — scheduling A/B only)",
    )
    ap.add_argument(
        "--approx-fold", type=int, default=None,
        help="approx-mode selection fold width L (config.set_approx_fold; "
             "default 256 — wider = better recall, narrower = faster)",
    )
    ap.add_argument(
        "--approx-gather-bits", type=int, default=None, choices=[8, 16],
        help="approx-mode gather precision (config.set_approx_gather_bits; "
             "8 = one int8 plane, half the gather MXU cost)",
    )
    ap.add_argument(
        "--fast-gather-bits", type=int, default=None, choices=[8, 16],
        help="fast-mode gather precision (config.set_fast_gather_bits; "
             "8 = one int8 plane, half the gather MXU cost, fast-quality "
             "selection)",
    )
    ap.add_argument(
        "--block-matmul", choices=["bf16", "int8"], default=None,
        help="fused-round ±1 block matmul operand type "
             "(config.set_round_block_matmul; int8 = 2x MXU rate, "
             "value-identical)",
    )
    ap.add_argument(
        "--graph-reuse", choices=["none", "conv2", "spatial"], default=None,
        help="kNN graph reuse across DGCNN rounds "
             "(config.set_graph_reuse; skips key build + selection in the "
             "reusing rounds — validate accuracy on a trained checkpoint)",
    )
    ap.add_argument(
        "--reuse-gather-window", type=int, default=None,
        help="gather-compaction width for graph-reuse rounds "
             "(config.set_reuse_gather_window; bitwise-identical output, "
             "engine Morton-sorts internally; needs --graph-reuse)",
    )
    ap.add_argument(
        "--reuse-k", type=int, default=None,
        help="neighbour ranks consumed by graph-reuse rounds "
             "(config.set_reuse_k; rank-major nearest-first slice — "
             "k-subsampling semantics, certify on a trained checkpoint; "
             "needs --graph-reuse)",
    )
    args = ap.parse_args()
    if args.reuse_k is not None:
        from svnet_tpu import config

        config.set_reuse_k(args.reuse_k)
    if args.reuse_gather_window is not None:
        from svnet_tpu import config

        config.set_reuse_gather_window(args.reuse_gather_window)
    if args.graph_reuse:
        from svnet_tpu import config

        config.set_graph_reuse(args.graph_reuse)
    if args.block_matmul:
        from svnet_tpu import config

        config.set_round_block_matmul(args.block_matmul)
    if args.approx_gather_bits:
        from svnet_tpu import config

        config.set_approx_gather_bits(args.approx_gather_bits)
    if args.fast_gather_bits:
        from svnet_tpu import config

        config.set_fast_gather_bits(args.fast_gather_bits)
    if args.exact_selection:
        from svnet_tpu import config

        config.set_exact_selection(args.exact_selection)
    if args.gather_pipeline:
        from svnet_tpu import config

        config.set_gather_pipeline(True)
    if args.approx_fold:
        from svnet_tpu import config

        config.set_approx_fold(args.approx_fold)
    # task-shape defaults (reference bench shapes: cls N=1024/k=20,
    # partseg N=2048/k=40 — main_cls_dgcnn.py:29, main_partseg_dgcnn.py:26-31)
    if args.batch is None:
        args.batch = 128 if args.task == "cls" else 32
    if args.num_points is None:
        args.num_points = 1024 if args.task == "cls" else 2048
    if args.k is None:
        args.k = 20 if args.task == "cls" else 40
    if args.fast and args.mode is None:  # deprecated alias, never overrides
        args.mode = "fast"
    modes = [args.mode] if args.mode else args.modes.split(",")

    from svnet_tpu import models

    def make_points(batch, num_points):
        if not args.surface:
            return jax.random.normal(
                jax.random.PRNGKey(0), (batch, num_points, 3)
            )
        from svnet_tpu.utils.synth import morton_sorted_surface_clouds

        return morton_sorted_surface_clouds(0, batch, num_points)

    dgcnn = args.arch == "dgcnn"

    def build_task(task, batch, num_points, k):
        """(Engine, variables, ex_args, flax_fwd) for one task's shapes."""
        if task == "cls":
            if dgcnn:
                from svnet_tpu.infer import SVDGCNNClsEngine as Engine

                model = models.SV_DGCNN_CLS(num_classes=40, k=k, binary=True)
            else:
                from svnet_tpu.infer import SVPointNetClsEngine as Engine

                model = models.SV_PointNet_CLS(
                    num_classes=40, k=k, binary=True
                )
            points = make_points(batch, num_points)
            variables = jax.jit(model.init)(jax.random.PRNGKey(1), points)
            ex_args = (points,)
            flax_fwd = lambda *a: model.apply(variables, a[0], False)
        else:
            if dgcnn:
                from svnet_tpu.infer import SVDGCNNPsegEngine as Engine

                model = models.SV_DGCNN_PSEG(num_part=50, k=k, binary=True)
            else:
                from svnet_tpu.infer import SVPointNetPsegEngine as Engine

                model = models.SV_PointNet_PSEG(
                    num_part=50, k=k, binary=True
                )
            points = make_points(batch, num_points)
            label = jax.nn.one_hot(
                jnp.arange(batch) % 16, 16, dtype=jnp.float32
            )
            variables = jax.jit(model.init)(
                jax.random.PRNGKey(1), points, label
            )
            ex_args = (points, label)
            flax_fwd = lambda *a: model.apply(variables, a[0], a[1], False)
        return Engine, variables, ex_args, flax_fwd

    main_task = build_task(args.task, args.batch, args.num_points, args.k)

    def make_timed(engine_kind, mode, task_built, k):
        Engine, variables, ex_args, flax_fwd = task_built
        if engine_kind == "fused":
            kw = dict(k=k, binary=True, mode=mode)
            if dgcnn:  # pointnet engines take neither rounds_impl nor window
                kw.update(rounds_impl=args.rounds_impl, window=args.window)
            eng = Engine(variables, **kw)
            forward = eng._forward
        else:
            forward = flax_fwd
        iters = args.iters

        @jax.jit
        def timed():
            def body(i, a):
                out = forward(*a)
                return tuple(
                    x + 1e-12 * jnp.mean(out) if x.dtype == jnp.float32 else x
                    for x in a
                )

            a = jax.lax.fori_loop(0, iters, body, ex_args)
            return jnp.sum(forward(*a))

        return timed

    def measure(mode, task_built=None, batch=None, k=None):
        # the remote-TPU tunnel occasionally drops a dispatch; retry, and
        # (unless --strict) fall back to the plain XLA engine.
        # Returns (median clouds/s, engine kind, per-repeat spread dict).
        task_built = task_built or main_task
        batch = batch or args.batch
        k = k or args.k
        fallbacks = [args.engine] if args.strict else [args.engine, "flax"]
        last_err = None
        for engine_kind in fallbacks:
            for attempt in range(3):
                try:
                    timed = make_timed(engine_kind, mode, task_built, k)
                    float(timed())  # compile + warm
                    vals = []
                    for _ in range(args.repeats):
                        t0 = time.perf_counter()
                        float(timed())
                        total_ms = (time.perf_counter() - t0) * 1e3
                        per_fwd_ms = max(
                            (total_ms - ROUNDTRIP_MS) / (args.iters + 1), 1e-6
                        )
                        vals.append(batch / (per_fwd_ms / 1e3))
                    spread = {
                        "stddev": round(statistics.pstdev(vals), 1),
                        "min": round(min(vals), 1),
                        "max": round(max(vals), 1),
                    }
                    return statistics.median(vals), engine_kind, spread
                except Exception as e:  # pragma: no cover - transient tunnel
                    print(f"# bench attempt failed ({engine_kind}/{mode}): {e}")
                    last_err = e
        raise RuntimeError(f"all bench attempts failed: {last_err}")

    results = {}
    engines = {}
    spreads = {}
    for mode in modes:
        results[mode], engines[mode], spreads[mode] = measure(mode)

    # serving-pick leg (knob-free DGCNN default runs only): the
    # accuracy-CERTIFIED composition. r4 demoted the r3 composition on
    # checkpoints trained WITHOUT its semantics (gb8 −4.8 acc, spatial
    # reuse −50 — ACCURACY.md r4); r5 recovers it with KNOB-AWARE
    # FINETUNING (--train-knobs): the finetuned checkpoints, evaluated
    # through the engine UNDER the composition, score at/above the base
    # checkpoints' exact accuracy (ACCURACY.md r5 serving certification;
    # evidence/r5/certify_*_ft.txt). The serving pick is therefore the
    # composition again: approx + 8-bit gathers + spatial graph reuse
    # (+ fold 512 and reuse_k=20 at partseg), served with a
    # knob-finetuned checkpoint. Checkpoints trained without
    # --train-knobs should serve plain approx (the r4 pick).
    serving = None
    serving_spread = None
    partseg_serving = None
    knob_free_default = (
        args.engine == "fused" and dgcnn and not args.mode
        and (not args.graph_reuse or args.graph_reuse == "none")
        and not args.approx_fold and not args.approx_gather_bits
        and not args.fast_gather_bits and not args.exact_selection
        and args.rounds_impl == "round3" and not args.window
        and not args.surface and args.block_matmul in (None, "bf16")
        and args.reuse_gather_window is None and args.reuse_k is None
    )
    if knob_free_default:
        from svnet_tpu import config as _cfg

        def serving_knobs(task, num_points):
            _cfg.set_approx_gather_bits(8)
            _cfg.set_graph_reuse("spatial")
            if task == "partseg":
                _cfg.set_approx_fold(512)
                _cfg.set_reuse_k(20)

        def reset_knobs():
            _cfg.set_approx_fold(256)
            _cfg.set_approx_gather_bits(16)
            _cfg.set_graph_reuse("none")
            _cfg.set_reuse_k(0)

        try:
            serving_knobs(args.task, args.num_points)
            v, ek, sp = measure("approx")
            if ek == "fused":
                serving, serving_spread = round(v, 1), sp
        except Exception as e:  # serving leg is additive — never fatal
            print(f"# serving-pick leg skipped: {e}")
        finally:
            reset_knobs()

        # partseg serving rides along in the default cls JSON so the
        # driver captures BOTH tasks' serving numbers every round
        # (VERDICT r3 task 2; BASELINE.md partseg target 1,200)
        if args.task == "cls":
            try:
                serving_knobs("partseg", 2048)
                ps_built = build_task("partseg", 32, 2048, 40)
                v, ek, sp = measure(
                    "approx", task_built=ps_built, batch=32, k=40
                )
                if ek == "fused":
                    partseg_serving = (round(v, 1), sp)
            except Exception as e:
                print(f"# partseg serving leg skipped: {e}")
            finally:
                reset_knobs()

    # headline: the accuracy-certified SERVING configuration when it was
    # measured (BASELINE.md's renegotiated target is defined for serving;
    # VERDICT r2 item 2 — the serving mode is the driver-captured
    # headline); fast/exact ride along as named parity legs.
    head_mode = modes[0]
    if serving is not None:
        value, head_label = serving, "serving"
        head_spread = serving_spread
    else:
        value, head_label = round(results[head_mode], 1), head_mode
        head_spread = spreads[head_mode]
    out = {
        "metric": f"svnet_{args.arch}_binary_inference_{args.task}",
        "value": value,
        "unit": (
            f"clouds/s/chip @ {args.num_points} pts "
            f"(B={args.batch}, k={args.k}, engine={engines[head_mode]}, "
            f"mode={head_label})"
        ),
        "vs_baseline": round(value / NORTH_STAR, 4),
        "vs_target": round(value / TARGET[args.task], 4),
        "engine": engines[head_mode],
        "mode": head_label,
        "engine_fallback": any(e != args.engine for e in engines.values()),
        # per-repeat spread of the headline (VERDICT r3 weak #6: publish
        # the band, not best-of-session)
        "value_stddev": head_spread["stddev"],
        "value_min": head_spread["min"],
        "value_max": head_spread["max"],
    }
    if serving is not None:
        out[f"value_{head_mode}"] = round(results[head_mode], 1)
    for mode in modes[1:]:
        out[f"value_{mode}"] = round(results[mode], 1)
    if partseg_serving is not None:
        out["value_partseg_serving"] = partseg_serving[0]
        out["value_partseg_serving_stddev"] = partseg_serving[1]["stddev"]
        out["vs_target_partseg"] = round(
            partseg_serving[0] / TARGET["partseg"], 4
        )
    if serving is not None:
        out["serving_config"] = (
            "approx + gb8 + spatial reuse"
            + (" + fold 512 + reuse_k 20" if args.task == "partseg" else "")
            + " — r5 pick, certified on KNOB-FINETUNED checkpoints"
              " (--train-knobs; ACCURACY.md r5, evidence/r5/certify_*_ft"
              ".txt); checkpoints trained without --train-knobs should"
              " serve plain approx (the r4 pick)"
        )
    # non-default serving knobs self-describe the measurement
    if args.graph_reuse and args.graph_reuse != "none":
        out["graph_reuse"] = args.graph_reuse
    if args.block_matmul and args.block_matmul != "bf16":
        out["block_matmul"] = args.block_matmul
    if args.approx_fold:
        out["approx_fold"] = args.approx_fold
    if args.approx_gather_bits and args.approx_gather_bits != 16:
        out["approx_gather_bits"] = args.approx_gather_bits
    if args.fast_gather_bits and args.fast_gather_bits != 16:
        out["fast_gather_bits"] = args.fast_gather_bits
    if args.reuse_gather_window:
        out["reuse_gather_window"] = args.reuse_gather_window
    if args.reuse_k:
        out["reuse_k"] = args.reuse_k
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Per-phase kernel timing: where does a fused engine forward spend time?

Times each Pallas phase standalone (first round, each conv round, the
conv5+SVFuse point block) and the full engine forward at the task's bench
shapes, with bench.py's chained-iteration methodology (the axon tunnel's
~26 ms fixed roundtrip would otherwise swamp per-call timings). The
residual between the phase sum and the engine total is XLA glue
(concats, gates, head).

This is the tool behind PERF.md's per-round tables (cls r2->r3) and the
partseg ablation. Usage:

    python tools/bench_rounds.py --task partseg [--mode fast] [--batch 32]
        [--window W]   # Morton candidate window, with --surface
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

os.chdir(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp

ROUNDTRIP_MS = 26.0


def timed_call(fn, args, iters, repeats):
    """Median per-call ms: chain `iters` data-dependent calls in one jit,
    fetch one scalar, subtract the fixed tunnel roundtrip."""

    @jax.jit
    def run():
        def body(i, a):
            out = fn(*a)
            bump = 1e-12 * jnp.mean(out[0] if isinstance(out, tuple) else out)
            return tuple(
                x + bump.astype(x.dtype) if x.dtype == jnp.float32 else x
                for x in a
            )

        a = jax.lax.fori_loop(0, iters, body, args)
        out = fn(*a)
        return jnp.sum(out[0] if isinstance(out, tuple) else out)

    float(run())  # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run())
        times.append(time.perf_counter() - t0)
    return max((statistics.median(times) * 1e3 - ROUNDTRIP_MS) / (iters + 1),
               1e-6)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=["cls", "partseg"], default="partseg")
    ap.add_argument("--mode", choices=["exact", "fast", "approx"],
                    default=None, help="default: both exact and fast")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--num-points", type=int, default=None)
    ap.add_argument("--k", type=int, default=None)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--window", type=int, default=0)
    ap.add_argument("--surface", action="store_true",
                    help="Morton-sorted deformed-sphere clouds (use with "
                         "--window; random clouds certify ~no skipping)")
    ap.add_argument("--reuse", action="store_true",
                    help="also time each conv round with a reused graph "
                         "(wins_in) — the per-round decomposition behind "
                         "config.graph_reuse")
    ap.add_argument("--block-matmul", choices=["bf16", "int8"], default=None,
                    help="config.set_round_block_matmul for all legs")
    ap.add_argument("--graph-reuse", choices=["none", "conv2", "spatial"],
                    default=None,
                    help="config.set_graph_reuse for the TOTAL engine leg")
    ap.add_argument("--approx-fold", type=int, default=None,
                    help="config.set_approx_fold for all legs")
    ap.add_argument("--approx-gather-bits", type=int, default=None,
                    choices=[8, 16],
                    help="config.set_approx_gather_bits for all legs")
    ap.add_argument("--morton-entry", action="store_true",
                    help="config.set_morton_entry for the TOTAL engine leg")
    args = ap.parse_args()

    if (args.block_matmul or args.graph_reuse or args.approx_fold
            or args.approx_gather_bits or args.morton_entry):
        from svnet_tpu import config

        if args.block_matmul:
            config.set_round_block_matmul(args.block_matmul)
        if args.graph_reuse:
            config.set_graph_reuse(args.graph_reuse)
        if args.approx_fold:
            config.set_approx_fold(args.approx_fold)
        if args.approx_gather_bits:
            config.set_approx_gather_bits(args.approx_gather_bits)
        if args.morton_entry:
            config.set_morton_entry(True)

    from svnet_tpu import models
    from svnet_tpu.ops.pallas.sv_round3 import sv_round3, sv_round3_first
    from svnet_tpu.ops.pallas.sv_point import sv_point_block

    if args.task == "cls":
        B = args.batch or 128
        N = args.num_points or 1024
        k = args.k or 20
        from svnet_tpu.infer import SVDGCNNClsEngine as Engine

        model = models.SV_DGCNN_CLS(num_classes=40, k=k, binary=True)
        mk = lambda pts: (
            model,
            jax.jit(model.init)(jax.random.PRNGKey(1), pts),
        )
    else:
        B = args.batch or 32
        N = args.num_points or 2048
        k = args.k or 40
        from svnet_tpu.infer import SVDGCNNPsegEngine as Engine

        model = models.SV_DGCNN_PSEG(num_part=50, k=k, binary=True)
        label = jax.nn.one_hot(jnp.arange(B) % 16, 16, dtype=jnp.float32)
        mk = lambda pts: (
            model,
            jax.jit(model.init)(jax.random.PRNGKey(1), pts, label),
        )

    rng = jax.random.PRNGKey(0)
    if args.surface:
        # deformed spheres, Morton-sorted: the window's target
        # distribution (the SAME generator bench.py and the recall tests
        # use — svnet_tpu/utils/synth.py)
        from svnet_tpu.utils.synth import morton_sorted_surface_clouds

        pts = morton_sorted_surface_clouds(0, B, N)
    else:
        pts = jax.random.normal(rng, (B, N, 3))

    _, variables = mk(pts)
    eng = Engine(variables, k=k, binary=True,
                 mode=args.mode or "exact", window=args.window)

    modes = [args.mode] if args.mode else ["exact", "fast"]
    print(f"# task={args.task} B={B} N={N} k={k} window={args.window} "
          f"surface={args.surface}")
    print(f"# per-phase ms/call and us/cloud (B={B})")
    for mode in modes:
        eng.mode = mode
        eng.exact = mode == "exact"
        rows = []

        ms = timed_call(
            lambda p: sv_round3_first(
                p, eng.folded_first,
                S_out=eng.dims["conv1"][0] if hasattr(eng, "dims") else 32,
                V_out=eng.dims["conv1"][1] if hasattr(eng, "dims") else 10,
                k=k, mode=mode, window=args.window,
            )[0],
            (pts,), args.iters, args.repeats,
        )
        rows.append(("first(conv1)", ms))

        rounds = (eng.rounds if hasattr(eng, "rounds") else {
            "conv2": (32, 10, 32, 10),
            "conv3": (32, 10, 64, 21),
            "conv4": (64, 21, 128, 42),
        })
        for name, (S, V, So, Vo) in rounds.items():
            src = jax.random.normal(
                jax.random.PRNGKey(2), (B, N, S + 3 * V), jnp.float32
            )
            ms = timed_call(
                lambda s, nm=name, S=S, V=V, So=So, Vo=Vo: sv_round3(
                    s, eng.folded[nm], S=S, V=V, S_out=So, V_out=Vo,
                    k=k, binary=True, mode=mode, window=args.window,
                )[0],
                (src,), args.iters, args.repeats,
            )
            rows.append((f"{name} ({S},{V})->({So},{Vo})", ms))
            if args.reuse:
                wins = sv_round3(
                    src, eng.folded[name], S=S, V=V, S_out=So, V_out=Vo,
                    k=k, binary=True, mode=mode, emit_wins=True,
                )[3]
                ms = timed_call(
                    lambda s, w, nm=name, S=S, V=V, So=So, Vo=Vo: sv_round3(
                        s, eng.folded[nm], S=S, V=V, S_out=So, V_out=Vo,
                        k=k, binary=True, mode=mode, wins_in=w,
                    )[0],
                    (src, wins), args.iters, args.repeats,
                )
                rows.append((f"{name} + wins_in (reused graph)", ms))

        if hasattr(eng, "S_c"):
            S_c, V_c, S5, V5 = eng.S_c, eng.V_c, eng.S5, eng.V5
        else:
            S_c, V_c, S5, V5 = 256, 83, 512, 170
        src5 = jax.random.normal(
            jax.random.PRNGKey(3), (B, N, S_c + 3 * V_c), jnp.float32
        )
        g5 = jnp.ones((B, V5), jnp.float32) * 0.5
        ms = timed_call(
            lambda s, g: sv_point_block(
                s, g, eng.folded_point, S=S_c, V=V_c, S_out=S5, V_out=V5,
                T=min(128, N), binary=True, exact=(mode == "exact"),
            )[0],
            (src5, g5), args.iters, args.repeats,
        )
        rows.append((f"point(conv5) ({S_c},{V_c})->({S5},{V5})", ms))

        fwd_args = (pts,) if args.task == "cls" else (pts, label)
        ms = timed_call(eng._forward, fwd_args, args.iters, args.repeats)
        rows.append(("TOTAL engine forward", ms))

        phase_sum = sum(m for n, m in rows[:-1] if "wins_in" not in n)
        print(f"\n== mode={mode}")
        for name, m in rows:
            print(f"  {name:<38} {m:8.2f} ms  {m / B * 1e3:8.1f} us/cloud")
        print(f"  {'phase sum':<38} {phase_sum:8.2f} ms   "
              f"(glue = {rows[-1][1] - phase_sum:+.2f} ms)")


if __name__ == "__main__":
    main()

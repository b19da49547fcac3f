"""Stage ablation of the v3 fused conv round: sel -> +gather -> full.

Times sv_round3 with its ``ablate`` profiling legs at the bench shapes so
PERF.md's per-phase attribution stays measured, not modeled:

    sel     key build + per-rank selection only
    gather  + one-hot int8 plane gathers + decode
    (full)  + edge build, SVBlock, pooling

Usage: python tools/bench_round3_stages.py [--task cls|partseg]
           [--mode fast] [--rounds conv3,conv4]
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


def timed_call(fn, args, iters=8, repeats=4):
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

    float(run())
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run())
        times.append(time.perf_counter() - t0)
    return max((statistics.median(times) * 1e3 - ROUNDTRIP_MS) / (iters + 1),
               1e-6)


ROUNDS = {
    "cls": {
        "conv2": (32, 10, 32, 10),
        "conv3": (32, 10, 64, 21),
        "conv4": (64, 21, 128, 42),
    },
    "partseg": {
        "conv2": (32, 10, 32, 10),
        "conv3": (32, 10, 64, 21),
        "conv4": (64, 21, 128, 42),
    },
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=["cls", "partseg"], default="cls")
    ap.add_argument("--mode", choices=["exact", "fast", "approx"],
                    default="fast")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--num-points", type=int, default=None)
    ap.add_argument("--k", type=int, default=None)
    ap.add_argument("--rounds", default=None,
                    help="comma-separated round names (default: all)")
    ap.add_argument("--reuse", action="store_true",
                    help="bench the graph-reuse (wins_in) path: selection "
                         "is skipped, so the legs start at gather")
    ap.add_argument("--tile", type=int, default=0,
                    help="override the kernel point-tile T (0 = auto)")
    ap.add_argument("--gather-window", type=int, default=0,
                    help="with --reuse: gather-compaction width "
                         "(config.reuse_gather_window mechanism). Uses "
                         "spatially-coherent features (Morton-sorted "
                         "surface positions lifted through a linear map) "
                         "so the winner blocks actually compact")
    args = ap.parse_args()

    B = args.batch or (128 if args.task == "cls" else 32)
    N = args.num_points or (1024 if args.task == "cls" else 2048)
    k = args.k or (20 if args.task == "cls" else 40)

    from svnet_tpu import models
    from svnet_tpu.ops.pallas.sv_edge import fold_svblock_params
    from svnet_tpu.ops.pallas.sv_round3 import sv_round3

    rounds = ROUNDS[args.task]
    names = args.rounds.split(",") if args.rounds else list(rounds)

    # any SVBlock params of the right shape will do: the cls model's
    # conv2/3/4 blocks match the partseg round dims exactly
    model = models.SV_DGCNN_CLS(num_classes=40, k=k, binary=True)
    pts = jax.random.normal(jax.random.PRNGKey(0), (2, N, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), pts)
    p, bs = variables["params"], variables["batch_stats"]

    print(f"# task={args.task} B={B} N={N} k={k} mode={args.mode}")
    print(f"# per-stage ms/call and us/cloud")
    for name in names:
        S, V, So, Vo = rounds[name]
        folded = jax.tree.map(
            jnp.asarray,
            fold_svblock_params(p[name], bs[name], S, V, True),
        )
        C = S + 3 * V
        src = jax.random.normal(
            jax.random.PRNGKey(2), (B, N, C), jnp.float32
        )
        wins = None
        if args.reuse and args.gather_window:
            # emulate the serving path exactly: graph_reuse='spatial' takes
            # the winner ids from the FIRST round's xyz kNN on the Morton-
            # sorted cloud — those are block-local by geometry (the engine
            # sorts at entry, infer._maybe_morton)
            from svnet_tpu import ops as _ops
            from svnet_tpu.utils.synth import morton_sorted_surface_clouds

            pos = morton_sorted_surface_clouds(7, B, N)  # (B, N, 3)
            wins = jnp.swapaxes(_ops.knn(pos, k), 1, 2)  # (B, k, N)
            import numpy as _np

            blk = _np.asarray(wins) // 128
            nt = max(N // (args.tile or 512), 1)  # locality at reuse tiles
            spans = [
                len(_np.unique(blk[b, :, t * (N // nt):(t + 1) * (N // nt)]))
                for b in range(min(B, 4)) for t in range(nt)
            ]
            print(f"# winner-block span (of {N // 128}): "
                  f"max {max(spans)} mean {sum(spans)/len(spans):.1f}")
        elif args.reuse:
            wins = sv_round3(
                src, folded, S=S, V=V, S_out=So, V_out=Vo, k=k,
                binary=True, mode=args.mode, emit_wins=True,
            )[3]
        prev = 0.0
        print(f"\n== {name} ({S},{V})->({So},{Vo})"
              + (" [reuse]" if args.reuse else ""))
        legs = ("gather", "noz", "novec", "") if args.reuse else (
            "sel", "gather", "noz", "novec", "")
        for leg in legs:
            ms = timed_call(
                lambda s, leg=leg, S=S, V=V, So=So, Vo=Vo: sv_round3(
                    s, folded, S=S, V=V, S_out=So, V_out=Vo, k=k,
                    binary=True, mode=args.mode, ablate=leg,
                    wins_in=wins, gather_window=args.gather_window,
                    T=args.tile,
                )[0],
                (src,),
            )
            tag = leg or "full"
            print(f"  {tag:<8} {ms:8.2f} ms  {ms / B * 1e3:8.1f} us/cloud"
                  f"   (+{(ms - prev) / B * 1e3:.1f})")
            prev = ms


if __name__ == "__main__":
    main()

"""On-chip point-tile (T) sweep for the v3 round kernels.

_round3_tiles picks T under a conservative ~11 MB live-state budget that
dates to the v2 kernel; v5e has ~128 MB VMEM and the kernels set
vmem_limit_bytes=110 MB, so the auto tile may be leaving MXU/VPU overlap
on the table — especially in the graph-reuse (wins_in) rounds, whose only
T-proportional state is the chunk's G one-hot masks. This tool measures a
round at several T values in one process so the auto heuristic can be
re-calibrated against data instead of a model.

Measured (r3.3, partseg shapes B=32 N=2048 k=40, fast + fast/approx
variants, conv4 with and without --reuse): the auto heuristic's picks
(T=128/256) sit within 1-3% of the best tile at every measured point and
larger tiles are neutral-to-worse (e.g. reuse conv4: auto T=128 = 264
us/cloud vs best 257 at T=2048 — inside session variance). The ~11 MB
live-state budget stands; no recalibration warranted.

Usage: python tools/sweep_tiles.py [--task partseg] [--mode fast]
           [--round conv4] [--reuse] [--gb8] [--tiles 128,256,512,1024]
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
    "first": (0, 0, 32, 10),
    "conv2": (32, 10, 32, 10),
    "conv3": (32, 10, 64, 21),
    "conv4": (64, 21, 128, 42),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=["cls", "partseg"], default="partseg")
    ap.add_argument("--mode", choices=["exact", "fast", "approx"],
                    default="fast")
    ap.add_argument("--round", default="conv4", choices=list(ROUNDS))
    ap.add_argument("--reuse", action="store_true")
    ap.add_argument("--gb8", action="store_true",
                    help="8-bit gather planes (the serving trade)")
    ap.add_argument("--fold", type=int, default=None,
                    help="approx fold width")
    ap.add_argument("--tiles", default="128,256,512,1024,2048")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--num-points", type=int, default=None)
    ap.add_argument("--k", type=int, default=None)
    args = ap.parse_args()

    B = args.batch or (128 if args.task == "cls" else 32)
    N = args.num_points or (1024 if args.task == "cls" else 2048)
    k = args.k or (20 if args.task == "cls" else 40)

    from svnet_tpu import config, models
    from svnet_tpu.ops.pallas.sv_edge import fold_svblock_params
    from svnet_tpu.ops.pallas.sv_edge_first import fold_first_params
    from svnet_tpu.ops.pallas.sv_round3 import sv_round3, sv_round3_first

    if args.gb8:
        config.set_fast_gather_bits(8)
        config.set_approx_gather_bits(8)
    if args.fold:
        config.set_approx_fold(args.fold)

    model = models.SV_DGCNN_CLS(num_classes=40, k=k, binary=True)
    pts = jax.random.normal(jax.random.PRNGKey(0), (2, N, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), pts)
    p, bs = variables["params"], variables["batch_stats"]

    S, V, So, Vo = ROUNDS[args.round]
    print(f"# task={args.task} B={B} N={N} k={k} mode={args.mode} "
          f"round={args.round} reuse={args.reuse} gb8={args.gb8}")

    if args.round == "first":
        folded = jax.tree.map(
            jnp.asarray,
            fold_first_params(p["init_scalar"], p["conv1"], bs["conv1"]),
        )
        src = jax.random.normal(jax.random.PRNGKey(2), (B, N, 3))
        for T in [int(t) for t in args.tiles.split(",") if int(t) <= N]:
            try:
                ms = timed_call(
                    lambda s, T=T: sv_round3_first(
                        s, folded, S_out=So, V_out=Vo, k=k,
                        mode=args.mode, T=T,
                    )[0],
                    (src,),
                )
                print(f"  T={T:<5} {ms:8.2f} ms  {ms / B * 1e3:8.1f} us/cloud")
            except Exception as e:
                print(f"  T={T:<5} FAILED: {type(e).__name__}: {str(e)[:120]}")
        return

    folded = jax.tree.map(
        jnp.asarray, fold_svblock_params(p[args.round], bs[args.round], S, V, True)
    )
    src = jax.random.normal(jax.random.PRNGKey(2), (B, N, S + 3 * V))
    wins = None
    if args.reuse:
        wins = sv_round3(
            src, folded, S=S, V=V, S_out=So, V_out=Vo, k=k,
            binary=True, mode=args.mode, emit_wins=True,
        )[3]
    for T in [int(t) for t in args.tiles.split(",") if int(t) <= N]:
        try:
            ms = timed_call(
                lambda s, T=T: sv_round3(
                    s, folded, S=S, V=V, S_out=So, V_out=Vo, k=k,
                    binary=True, mode=args.mode, wins_in=wins, T=T,
                )[0],
                (src,),
            )
            print(f"  T={T:<5} {ms:8.2f} ms  {ms / B * 1e3:8.1f} us/cloud")
        except Exception as e:
            print(f"  T={T:<5} FAILED: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()

"""On-chip A/B of per-rank top-k extraction strategies for the round kernels.

Selection is the measured wall of the partseg rounds (PERF.md): k per-rank
sweeps of an (N, T) int32 key array dominate a fused round at N=2048/k=40.
This tool times ONLY the selection loop (key build + k extracted win-ids,
summed to prevent DCE) for the candidate strategies, on the real chip,
using bench.py's chained-iteration methodology:

  update   — r2/r3.0 scheme: INT_MIN scatter write + fresh max per rank
  thresh   — r3.1 scheme: immutable keys, max over (key < last) per rank
  thresh2  — thresh + hand-rolled halving max tree (vs jnp.max lowering)
  top2     — tournament fold carrying sorted-2 tuples: 2 ranks per sweep
  top4     — tournament fold carrying sorted-4 tuples: 4 ranks per sweep

The tuple folds rely on packed keys being UNIQUE (row id in the low bits),
so G win-ids fall out of one traversal; the threshold (strictly below the
G-th value of the last sweep) carries between sweeps. Merge of two sorted
lists uses c_i = max_j min(a_j, b_{i-j}) (j=0..i, x_0 = +inf, x_{>G} = -inf).
"""

from __future__ import annotations

import argparse
import functools
import os
import statistics
import sys
import time

os.chdir(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svnet_tpu.ops.pallas.sv_round2 import _BIG, _INT_MIN, _idx_bits
from svnet_tpu.ops.pallas.sv_round3 import (
    _packed_key_t,
    _sortable_ikey,
    _top_group,
    _top_group_pair,
)

ROUNDTRIP_MS = 26.0


def _win(m, ib):
    return (ib - 1) - jnp.remainder(m, ib)


def _tree_max(x, leaf=8):
    n = x.shape[0]
    while n > leaf:
        n //= 2
        x = jnp.maximum(x[:n, :], x[n:2 * n, :])
    return jnp.max(x, axis=0, keepdims=True)


# The tournament machinery itself (_merge_sorted_keys, _top_group,
# _top_group_pair) is imported from the SHIPPED kernel module so the A/B
# measures production code, not a copy.


def _sel_kernel(x_ref, out_ref, *, k: int, N: int, variant: str):
    T = out_ref.shape[2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    neg = -x_ref[0]
    ib = np.int32(1 << _idx_bits(N))

    if variant == "xupdate":
        # current exact-mode production loop (sv_round3 r3.0 semantics)
        key = _sortable_ikey(neg)
        m = jnp.max(key, axis=0, keepdims=True)
        for j in range(k):
            amin = jnp.min(
                jnp.where(key == m, rows, _BIG), axis=0, keepdims=True
            )
            out_ref[0, j, :] = amin[0]
            key = jnp.where(rows == amin, _INT_MIN, key)
            m = jnp.max(key, axis=0, keepdims=True)
        return
    if variant.startswith("xval"):
        # r4 'value' scheme: single-plane value tournament + per-rank
        # min-row extraction with incremental exclusion, group scatter
        G = int(variant[4:])
        key = _sortable_ikey(neg)
        for j0 in range(0, k, G):
            g = min(G, k - j0)
            tops = _top_group(key, g, None)
            excl = None
            for gi in range(g):
                elig = key == tops[gi]
                if excl is not None:
                    elig = elig & excl
                amin = jnp.min(
                    jnp.where(elig, rows, _BIG), axis=0, keepdims=True
                )
                out_ref[0, j0 + gi, :] = amin[0]
                hit = rows != amin
                excl = hit if excl is None else (excl & hit)
            if j0 + g < k:
                key = jnp.where(excl, key, _INT_MIN)
        return
    if variant.startswith("pair"):
        G = int(variant[4:])
        key = _sortable_ikey(neg)
        # (N, 1) broadcastable rows column, exactly as _select_rows passes
        # it — a materialized (N, T) rows operand trips a Mosaic
        # vector-layout crash at N=2048 (extract_strided_slice check)
        st = None
        for j0 in range(0, k, G):
            tops = _top_group_pair(key, rows, G, st)
            st = tops[-1]
            for g in range(min(G, k - j0)):
                out_ref[0, j0 + g, :] = tops[g][1][0]
        return

    key = _packed_key_t(neg, rows, N)
    if variant == "update":
        m = jnp.max(key, axis=0, keepdims=True)
        for j in range(k):
            out_ref[0, j, :] = _win(m, ib)[0]
            key = jnp.where(key == m, _INT_MIN, key)
            m = jnp.max(key, axis=0, keepdims=True)
    elif variant in ("thresh", "thresh2"):
        red = _tree_max if variant == "thresh2" else (
            lambda x: jnp.max(x, axis=0, keepdims=True)
        )
        st = None
        for j in range(k):
            m = red(key if st is None else jnp.where(key < st, key, _INT_MIN))
            st = m
            out_ref[0, j, :] = _win(m, ib)[0]
    else:
        fused = variant.endswith("f")
        G = int(variant[3:-1] if fused else variant[3:])
        st = None
        for j0 in range(0, k, G):
            if fused:
                tops = _top_group(key, G, st)
            else:
                elig = key if st is None else jnp.where(key < st, key, _INT_MIN)
                tops = _top_group(elig, G, None)
            st = tops[-1]
            for g in range(min(G, k - j0)):
                out_ref[0, j0 + g, :] = _win(tops[g], ib)[0]


@functools.partial(jax.jit, static_argnames=("k", "T", "variant", "interpret"))
def run_sel(x, k, T, variant, interpret=False):
    B, N, _ = x.shape
    return pl.pallas_call(
        functools.partial(_sel_kernel, k=k, N=N, variant=variant),
        grid=(B, N // T),
        in_specs=[
            pl.BlockSpec((1, N, T), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, k, T), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, k, N), jnp.int32),
        interpret=interpret,
    )(x)


def timed(fn, args, iters=8, repeats=5):
    @jax.jit
    def run():
        def body(i, a):
            out = fn(*a)
            return (a[0] + 1e-12 * out[0, 0, 0].astype(jnp.float32),) + a[1:]

        a = jax.lax.fori_loop(0, iters, body, args)
        return jnp.sum(fn(*a))

    float(run())
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run())
        ts.append(time.perf_counter() - t0)
    return max((statistics.median(ts) * 1e3 - ROUNDTRIP_MS) / (iters + 1), 1e-6)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--num-points", type=int, default=2048)
    ap.add_argument("--k", type=int, default=40)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--check", action="store_true", help="interpret-mode parity")
    ap.add_argument(
        "--variants", default="update,thresh,thresh2,top2,top4"
    )
    args = ap.parse_args()

    B, N, k, T = args.batch, args.num_points, args.k, args.tile
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, N, N), jnp.float32)

    if args.check:
        # coarse quantization forces distance TIES — the exact-family
        # variants must break them in increasing row order (torch.topk)
        xs = jnp.round(x[:1, :, :] * 64.0) / 64.0
        refs = {}
        for v in args.variants.split(","):
            base = ("xupdate" if (v.startswith("pair") or v.startswith("xval")
                    or v == "xupdate") else "update")
            if base not in refs:
                refs[base] = np.asarray(run_sel(xs, k, T, base, interpret=True))
            if v == base:
                continue
            got = np.asarray(run_sel(xs, k, T, v, interpret=True))
            assert (got == refs[base]).all(), (v, (got != refs[base]).sum())
            print(f"{v}: matches {base}")
        return

    print(f"# selection A/B: B={B} N={N} k={k} T={T} (ms/call, us/cloud)")
    for v in args.variants.split(","):
        ms = timed(functools.partial(run_sel, k=k, T=T, variant=v), (x,))
        print(f"  {v:8s} {ms:8.2f} ms   {ms / B * 1e3:8.1f} us/cloud")


if __name__ == "__main__":
    main()

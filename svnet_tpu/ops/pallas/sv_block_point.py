"""Fused per-point SVBlock eval kernel (no edges, no pooling).

The per-point SVBlocks of SV-PointNet (conv1/conv2/conv3/conv_fuse and the
SV_STNkd trunk, ref sv_pointnet_cls.py:12-58) spend their time in
thin-channel (…, 3, V) elementwise work that XLA pads ~15x; this kernel
runs one (batch, point-tile) program entirely in VMEM on 2D tiles:

  src (T, S + 3V) -> SVBlock -> s_out (T, S_out), v_out (T, 3*V_out)

The gate depends only on the mean of the (materialized) input scalars, so
the caller computes it in XLA and passes it in; BN affines are folded as in
sv_edge.fold_svblock_params (reused verbatim).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-6


def _block_point_kernel(
    src_ref, gate_ref,
    wz_ref, w1_ref, beta_ref, a1_ref, b1_ref,
    w2_ref, scale2_ref, a2_ref, b2_ref,
    s_out_ref, v_out_ref,
    *, S: int, V: int, S_out: int, V_out: int, T: int, binary: bool,
    exact: bool,
):
    prec = jax.lax.Precision.HIGHEST if exact else None
    src = src_ref[0]  # (T, S + 3V)
    v = [src[:, S + i * V : S + (i + 1) * V] for i in range(3)]

    wz = wz_ref[:]
    z = [
        jnp.dot(v[i], wz, preferred_element_type=jnp.float32, precision=prec)
        for i in range(3)
    ]
    sv = []
    for j in range(3):
        acc = v[0] * z[0][:, j : j + 1]
        acc = acc + v[1] * z[1][:, j : j + 1]
        acc = acc + v[2] * z[2][:, j : j + 1]
        sv.append(acc)  # (T, V)

    x_cat = jnp.concatenate([src[:, :S]] + sv, axis=1) if S > 0 else (
        jnp.concatenate(sv, axis=1)
    )
    if binary:
        xq = jnp.sign(x_cat + beta_ref[:]).astype(jnp.bfloat16)
        h = jnp.dot(
            xq, w1_ref[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )
    else:
        h = jnp.dot(
            x_cat, w1_ref[:], preferred_element_type=jnp.float32, precision=prec
        )
    y = h * a1_ref[:] + b1_ref[:]
    s_out_ref[0] = jnp.where(y >= 0, y, 0.2 * y)

    w2 = w2_ref[:]
    wlin = [
        jnp.dot(v[i], w2, preferred_element_type=jnp.float32, precision=prec)
        * scale2_ref[:]
        for i in range(3)
    ]
    nsq = wlin[0] * wlin[0] + wlin[1] * wlin[1] + wlin[2] * wlin[2]
    nrm = jnp.sqrt(nsq) + EPS
    f = (a2_ref[:] + b2_ref[:] / nrm) * gate_ref[0]
    for i in range(3):
        v_out_ref[0, :, i * V_out : (i + 1) * V_out] = wlin[i] * f


@functools.partial(
    jax.jit,
    static_argnames=("S", "V", "S_out", "V_out", "T", "binary", "exact", "interpret"),
)
def sv_block_point(
    src: jax.Array,   # (B, N, S + 3V)
    gate: jax.Array,  # (B, V_out)
    folded: Dict[str, jax.Array],
    *, S: int, V: int, S_out: int, V_out: int, T: int = 256,
    binary: bool = True, exact: bool = True, interpret: bool = False,
):
    """Per-point SVBlock. Returns (s_out (B,N,S_out), v_out GATED
    (B,N,3*V_out) flat i-major). Weights from sv_edge.fold_svblock_params
    with (S_edge=..., V_edge=...) matching this block's input dims — note
    per-point blocks take (S, V) directly, so fold with S_fold = S - ?: use
    ``fold_point_like_params`` below instead."""
    B, N, Cin = src.shape
    T = min(T, N)
    assert N % T == 0
    const = lambda b, t: (0, 0)
    return pl.pallas_call(
        functools.partial(
            _block_point_kernel,
            S=S, V=V, S_out=S_out, V_out=V_out, T=T, binary=binary, exact=exact,
        ),
        grid=(B, N // T),
        in_specs=[
            pl.BlockSpec((1, T, Cin), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, V_out), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((V, 3), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((S + 3 * V, S_out), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S + 3 * V), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_out), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_out), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((V, V_out), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V_out), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V_out), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V_out), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, T, S_out), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 3 * V_out), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, S_out), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 3 * V_out), jnp.float32),
        ),
        interpret=interpret,
    )(
        src, gate.reshape(B, 1, V_out),
        folded["wz"], folded["w1"], folded["beta"], folded["a1"], folded["b1"],
        folded["w2"], folded["scale2"], folded["a2"], folded["b2"],
    )


def fold_point_like_params(
    params: dict, stats: dict, S: int, V: int, binary: bool
) -> Dict[str, jax.Array]:
    """Fold an SVBlock for per-point use: identical to
    sv_edge.fold_svblock_params but the row permutation covers (S, 3V)
    directly (no edge doubling)."""
    eps_bn = 1e-5
    perm = list(range(S)) + [S + c * 3 + j for j in range(3) for c in range(V)]
    perm = jnp.asarray(perm, dtype=jnp.int32)

    w1 = params["linear1"]["kernel"][perm, :]
    if binary:
        beta = params["linear1"]["beta"][perm][None, :]
        w1 = jnp.sign(w1)
        scale1 = params["linear1"]["scale"]
    else:
        beta = jnp.zeros((1, w1.shape[0]), w1.dtype)
        scale1 = jnp.ones((w1.shape[1],), w1.dtype)

    bn1 = params["bn1"]["bn"]
    bs1 = stats["bn1"]["bn"]
    inv1 = bn1["scale"] / jnp.sqrt(bs1["var"] + eps_bn)
    a1 = (scale1 * inv1)[None, :]
    b1 = (bn1["bias"] - bs1["mean"] * inv1)[None, :]

    w2 = params["linear2"]["kernel"]
    if binary:
        scale2 = params["linear2"]["scale"][None, :]
        w2 = jnp.sign(w2)
    else:
        scale2 = jnp.ones((1, w2.shape[1]), w2.dtype)

    bn2 = params["bn2"]["bn"]
    bs2 = stats["bn2"]["bn"]
    inv2 = bn2["scale"] / jnp.sqrt(bs2["var"] + eps_bn)

    wz = params["v2s"]["linear"]["kernel"]
    if binary:
        wz = jnp.sign(wz) * params["v2s"]["linear"]["scale"][None, :]

    return {
        "wz": wz, "w1": w1, "beta": beta, "a1": a1, "b1": b1,
        "w2": w2, "scale2": scale2, "a2": inv2[None, :],
        "b2": (bn2["bias"] - bs2["mean"] * inv2)[None, :],
    }

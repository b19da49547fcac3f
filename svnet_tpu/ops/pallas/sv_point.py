"""Fused per-point tail for SV-DGCNN: conv5 SVBlock + SVFuse in one kernel.

Covers reference sv_dgcnn_cls.py:68-69 (conv5 SVBlock on the skip-concat
features -> SVFuse invariant read-out) per (batch, tile of T points):

  s_c (T, 256), v_c (T, 3x83 flat) -> x (T, 1022)

All the thin-channel (…, 3, C) elementwise work that XLA pads 15x happens
in VMEM on 2D tiles. The SVFuse output is emitted j-major (frame-direction
major); the consumer (the classifier head) gets its first linear's rows
permuted accordingly at fold time (see ``head_perm``).

The conv5 gate is computed by the host from the materialized s_c (a cheap
(B, N, 256) mean) and passed in.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-6


def _point_kernel(
    src_ref, gate_ref,
    wz_ref, w1_ref, beta_ref, a1_ref, b1_ref,
    w2_ref, scale2_ref, a2_ref, b2_ref, wzf_ref,
    out_ref, smax_ref, vsum_ref,
    *, S: int, V: int, S_out: int, V_out: int, T: int, binary: bool,
    exact: bool,
):
    prec = jax.lax.Precision.HIGHEST if exact else None
    src = src_ref[0]  # (T, S + 3V)

    v = [src[:, S + i * V : S + (i + 1) * V] for i in range(3)]  # (T, V) x3

    # conv5's Vector2Scalar on the input vectors
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

    x_cat = jnp.concatenate([src[:, :S]] + sv, axis=1)  # (T, S + 3V) j-major
    if binary:
        xq = jnp.sign(x_cat + beta_ref[:])
        h = jnp.dot(
            xq.astype(jnp.bfloat16),
            w1_ref[:].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    else:
        h = jnp.dot(
            x_cat, w1_ref[:], preferred_element_type=jnp.float32, precision=prec
        )
    s5 = h * a1_ref[:] + b1_ref[:]
    s5 = jnp.where(s5 >= 0, s5, 0.2 * s5)  # (T, S_out)

    # conv5 vector path
    w2 = w2_ref[:]
    wlin = [
        jnp.dot(v[i], w2, preferred_element_type=jnp.float32, precision=prec)
        * scale2_ref[:]
        for i in range(3)
    ]  # (T, V_out)
    nsq = wlin[0] * wlin[0] + wlin[1] * wlin[1] + wlin[2] * wlin[2]
    nrm = jnp.sqrt(nsq) + EPS
    f = (a2_ref[:] + b2_ref[:] / nrm) * gate_ref[0]
    v5 = [wlin[i] * f for i in range(3)]  # (T, V_out)

    # SVFuse: invariants of v5 through its own (binarizable) frame
    wzf = wzf_ref[:]
    zf = [
        jnp.dot(v5[i], wzf, preferred_element_type=jnp.float32, precision=prec)
        for i in range(3)
    ]
    svf = []
    for j in range(3):
        acc = v5[0] * zf[0][:, j : j + 1]
        acc = acc + v5[1] * zf[1][:, j : j + 1]
        acc = acc + v5[2] * zf[2][:, j : j + 1]
        svf.append(acc)  # (T, V_out)

    out_ref[0] = jnp.concatenate([s5] + svf, axis=1)  # (T, S_out + 3*V_out)
    # per-tile pooled partials of the (gated) conv5 output, for consumers
    # that need the pre-SVFuse block output pooled over N (partseg conv6)
    smax_ref[0, 0] = jnp.max(s5, axis=0, keepdims=True)
    vsum_ref[0, 0] = jnp.concatenate(
        [jnp.sum(v5[i], axis=0, keepdims=True) for i in range(3)], axis=1
    )


def _point_kernel_cm(
    src_ref, gate_ref,
    wzT_ref, w1T_ref, betaT_ref, a1T_ref, b1T_ref,
    w2T_ref, scale2T_ref, a2T_ref, b2T_ref, wzfT_ref,
    out_ref, smax_ref, vsum_ref,
    *, S: int, V: int, S_out: int, V_out: int, T: int, binary: bool,
    exact: bool, v_off: tuple,
):
    """Channel-major twin of _point_kernel: src arrives (C_in, T) with
    channels along SUBLANES and points along LANES, so the engines'
    channel-major trunks feed it with ZERO relayouts. ``v_off``: static
    (row offset, V_r) pairs of the trunk's per-round j-major vector
    blocks — direction i of round r lives at rows [o + i*V_r, o +
    (i+1)*V_r); concatenating the per-round direction slices yields the
    reference c-order, so the SAME folded weights apply (transposed).
    Math is the row-major kernel's, transposed — bitwise-equal modulo
    dot-general operand order (parity test: tests/test_tpu_kernels.py).
    """
    prec = jax.lax.Precision.HIGHEST if exact else None
    src = src_ref[0]  # (C_in, T)

    v = [
        jnp.concatenate(
            [src[o + i * Vr : o + (i + 1) * Vr, :] for (o, Vr) in v_off],
            axis=0,
        )
        for i in range(3)
    ]  # (V, T) x3, c in reference order

    # conv5's Vector2Scalar on the input vectors
    wzT = wzT_ref[:]  # (3, V)
    z = [
        jnp.dot(wzT, v[i], preferred_element_type=jnp.float32, precision=prec)
        for i in range(3)
    ]  # (3, T)
    sv = []
    for j in range(3):
        acc = v[0] * z[0][j : j + 1, :]
        acc = acc + v[1] * z[1][j : j + 1, :]
        acc = acc + v[2] * z[2][j : j + 1, :]
        sv.append(acc)  # (V, T)

    x_cat = jnp.concatenate([src[:S, :]] + sv, axis=0)  # (S + 3V, T) j-major
    if binary:
        xq = jnp.sign(x_cat + betaT_ref[:])
        h = jnp.dot(
            w1T_ref[:].astype(jnp.bfloat16),
            xq.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    else:
        h = jnp.dot(
            w1T_ref[:], x_cat, preferred_element_type=jnp.float32, precision=prec
        )
    s5 = h * a1T_ref[:] + b1T_ref[:]
    s5 = jnp.where(s5 >= 0, s5, 0.2 * s5)  # (S_out, T)

    # conv5 vector path
    w2T = w2T_ref[:]  # (V_out, V)
    wlin = [
        jnp.dot(w2T, v[i], preferred_element_type=jnp.float32, precision=prec)
        * scale2T_ref[:]
        for i in range(3)
    ]  # (V_out, T)
    nsq = wlin[0] * wlin[0] + wlin[1] * wlin[1] + wlin[2] * wlin[2]
    nrm = jnp.sqrt(nsq) + EPS
    f = (a2T_ref[:] + b2T_ref[:] / nrm) * gate_ref[0]
    v5 = [wlin[i] * f for i in range(3)]  # (V_out, T)

    # SVFuse: invariants of v5 through its own (binarizable) frame
    wzfT = wzfT_ref[:]  # (3, V_out)
    zf = [
        jnp.dot(wzfT, v5[i], preferred_element_type=jnp.float32, precision=prec)
        for i in range(3)
    ]
    svf = []
    for j in range(3):
        acc = v5[0] * zf[0][j : j + 1, :]
        acc = acc + v5[1] * zf[1][j : j + 1, :]
        acc = acc + v5[2] * zf[2][j : j + 1, :]
        svf.append(acc)  # (V_out, T)

    out_ref[0] = jnp.concatenate([s5] + svf, axis=0)  # (S_out + 3*V_out, T)
    smax_ref[0, 0] = jnp.max(s5, axis=1, keepdims=True)
    vsum_ref[0, 0] = jnp.concatenate(
        [jnp.sum(v5[i], axis=1, keepdims=True) for i in range(3)], axis=0
    )


@functools.partial(
    jax.jit,
    static_argnames=("S", "V", "S_out", "V_out", "T", "binary", "exact",
                     "interpret", "v_off"),
)
def sv_point_block_cm(
    src: jax.Array,   # (B, S + 3V, N) channel-major: [s rows | per-round j-major v rows]
    gate: jax.Array,  # (B, V_out)
    folded: Dict[str, jax.Array],
    *, S: int, V: int, S_out: int, V_out: int, v_off: tuple, T: int = 128,
    binary: bool = True, exact: bool = True, interpret: bool = False,
):
    """Channel-major sv_point_block: consumes the round3 cm trunk's
    (B, C, N) activations directly and returns x (B, S_out + 3*V_out, N)
    (same channel order as the row-major x's last axis, SVFuse j-major),
    plus s5_max (B, S_out) / v5_mean (B, 3*V_out) — zero XLA relayouts
    end-to-end. ``v_off``: per-round (row offset, V_r) of the trunk's
    vector blocks within ``src``."""
    B, Cin, N = src.shape
    assert Cin == S + 3 * V
    assert N % T == 0
    # v_off contract: round blocks tile [S, S + 3V) exactly, in order —
    # a mis-based offset (e.g. forgetting the scalar-row base) would read
    # scalar rows as vector components with no shape error to catch it
    o = S
    for (off, Vr) in v_off:
        assert off == o, (v_off, "blocks must tile [S, S+3V) in order")
        o += 3 * Vr
    assert o == S + 3 * V, (v_off, V)
    const = lambda b, t: (0, 0)
    x, smax, vsum = pl.pallas_call(
        functools.partial(
            _point_kernel_cm,
            S=S, V=V, S_out=S_out, V_out=V_out, T=T, binary=binary,
            exact=exact, v_off=v_off,
        ),
        grid=(B, N // T),
        in_specs=[
            pl.BlockSpec((1, Cin, T), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V_out, 1), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, V), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((S_out, S + 3 * V), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((S + 3 * V, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((S_out, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((S_out, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((V_out, V), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((V_out, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((V_out, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((V_out, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, V_out), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, S_out + 3 * V_out, T), lambda b, t: (b, 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, S_out, 1), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3 * V_out, 1), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, S_out + 3 * V_out, N), jnp.float32),
            jax.ShapeDtypeStruct((B, N // T, S_out, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, N // T, 3 * V_out, 1), jnp.float32),
        ),
        interpret=interpret,
    )(
        src, gate.reshape(B, V_out, 1),
        folded["wz"].T, folded["w1"].T, folded["beta"].T, folded["a1"].T,
        folded["b1"].T, folded["w2"].T, folded["scale2"].T, folded["a2"].T,
        folded["b2"].T, folded["wzf"].T,
    )
    s5_max = jnp.max(smax[:, :, :, 0], axis=1)  # (B, S_out)
    v5_mean = jnp.sum(vsum[:, :, :, 0], axis=1) / N  # (B, 3*V_out)
    return x, s5_max, v5_mean


@functools.partial(
    jax.jit,
    static_argnames=("S", "V", "S_out", "V_out", "T", "binary", "exact", "interpret"),
)
def sv_point_block(
    src: jax.Array,   # (B, N, S + 3V): [s_c | v_c flat i-major]
    gate: jax.Array,  # (B, V_out)
    folded: Dict[str, jax.Array],
    *, S: int, V: int, S_out: int, V_out: int, T: int = 128,
    binary: bool = True, exact: bool = True, interpret: bool = False,
) -> jax.Array:
    """Returns (x (B, N, S_out + 3*V_out) with SVFuse channels j-major,
    s5_max (B, S_out) pooled scalars, v5_mean (B, 3*V_out) pooled vectors
    of the gated conv5 output)."""
    B, N, Cin = src.shape
    assert N % T == 0
    const = lambda b, t: (0, 0)
    x, smax, vsum = pl.pallas_call(
        functools.partial(
            _point_kernel,
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
            pl.BlockSpec((V_out, 3), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, T, S_out + 3 * V_out), lambda b, t: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, 1, S_out), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 3 * V_out), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, S_out + 3 * V_out), jnp.float32),
            jax.ShapeDtypeStruct((B, N // T, 1, S_out), jnp.float32),
            jax.ShapeDtypeStruct((B, N // T, 1, 3 * V_out), jnp.float32),
        ),
        interpret=interpret,
    )(
        src, gate.reshape(B, 1, V_out),
        folded["wz"], folded["w1"], folded["beta"], folded["a1"], folded["b1"],
        folded["w2"], folded["scale2"], folded["a2"], folded["b2"],
        folded["wzf"],
    )
    s5_max = jnp.max(smax[:, :, 0, :], axis=1)  # (B, S_out)
    v5_mean = jnp.sum(vsum[:, :, 0, :], axis=1) / N  # (B, 3*V_out)
    return x, s5_max, v5_mean


def fold_point_params(
    conv5_p: dict, conv5_bs: dict, svfuse_p: dict, S: int, V: int, binary: bool
) -> Dict[str, jax.Array]:
    """Fold conv5 + svfuse params; rows of linear1 permuted c-major->j-major."""
    eps_bn = 1e-5
    perm = list(range(S)) + [S + c * 3 + j for j in range(3) for c in range(V)]
    perm = jnp.asarray(perm, dtype=jnp.int32)

    w1 = conv5_p["linear1"]["kernel"][perm, :]
    if binary:
        beta = conv5_p["linear1"]["beta"][perm][None, :]
        w1 = jnp.sign(w1)
        scale1 = conv5_p["linear1"]["scale"]
    else:
        beta = jnp.zeros((1, w1.shape[0]), w1.dtype)
        scale1 = jnp.ones((w1.shape[1],), w1.dtype)

    bn1 = conv5_p["bn1"]["bn"]
    bs1 = conv5_bs["bn1"]["bn"]
    inv1 = bn1["scale"] / jnp.sqrt(bs1["var"] + eps_bn)
    a1 = (scale1 * inv1)[None, :]
    b1 = (bn1["bias"] - bs1["mean"] * inv1)[None, :]

    w2 = conv5_p["linear2"]["kernel"]
    if binary:
        scale2 = conv5_p["linear2"]["scale"][None, :]
        w2 = jnp.sign(w2)
    else:
        scale2 = jnp.ones((1, w2.shape[1]), w2.dtype)

    bn2 = conv5_p["bn2"]["bn"]
    bs2 = conv5_bs["bn2"]["bn"]
    inv2 = bn2["scale"] / jnp.sqrt(bs2["var"] + eps_bn)

    wz = conv5_p["v2s"]["linear"]["kernel"]
    wzf = svfuse_p["v2s"]["linear"]["kernel"]
    if binary:
        wz = jnp.sign(wz) * conv5_p["v2s"]["linear"]["scale"][None, :]
        wzf = jnp.sign(wzf) * svfuse_p["v2s"]["linear"]["scale"][None, :]

    return {
        "wz": wz, "w1": w1, "beta": beta, "a1": a1, "b1": b1,
        "w2": w2, "scale2": scale2, "a2": inv2[None, :],
        "b2": (bn2["bias"] - bs2["mean"] * inv2)[None, :], "wzf": wzf,
    }


def head_perm(S_out: int, V_out: int) -> jnp.ndarray:
    """Row permutation for a consumer of [max(x), mean(x)] where x's SVFuse
    channels were emitted j-major instead of the reference's c-major.

    Returns perm with W_new = W_ref[perm] so that
    x_jmajor @ W_new == x_cmajor @ W_ref.
    """
    block = list(range(S_out)) + [
        S_out + c * 3 + j for j in range(3) for c in range(V_out)
    ]
    width = S_out + 3 * V_out
    full = block + [width + r for r in block]
    return jnp.asarray(full, dtype=jnp.int32)

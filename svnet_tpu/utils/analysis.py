"""Complexity analysis: Params / MACs / ADDs / BOPs from the traced program.

Replaces the reference's params_macs/ mirrors (2,314 LoC of hand-maintained
per-model formulas, SURVEY.md §2.11) with counts derived from the model's
own traced jaxpr — one source of truth that cannot drift from models/.

Classification convention (matches params_macs/macs.py:20-122):
  * a matmul whose BOTH operands pass through ``sign`` -> BOPs (the
    XNOR-popcount-mappable 1-bit ops of the binarized scalar stream);
  * ONE operand signed (weights-only binarization, the vector stream)
    -> ADDs (multiplies by ±1 degenerate to additions);
  * otherwise -> MACs.

Param size: binarized kernels (identified by a sibling per-channel
``scale``, which only binarized Linears create) weigh 1 bit vs 32
(params_macs/macs.py:6-17).

CLI:  python -m svnet_tpu.utils.analysis --model svnet --backbone dgcnn \
        --task cls --binary [--num-points 1024] [--k 20]
"""

from __future__ import annotations

import argparse
from typing import Dict, Tuple

import jax
import numpy as np

_PASSTHROUGH = {
    "convert_element_type",
    "broadcast_in_dim",
    "reshape",
    "transpose",
    "squeeze",
    "expand_dims",
    "copy",
}


def count_params(params, binary_bit: int = 1) -> Dict[str, float]:
    """Parameter count (M) and storage (Mbit) with 1-bit binarized kernels."""
    total = 0
    binarized = 0

    def walk(tree):
        nonlocal total, binarized
        if not isinstance(tree, dict):
            return
        leaves = {k: v for k, v in tree.items() if not isinstance(v, dict)}
        for k, v in leaves.items():
            total += int(np.prod(np.asarray(v).shape))
        if "kernel" in leaves and "scale" in leaves:
            binarized += int(np.prod(np.asarray(leaves["kernel"]).shape))
        for v in tree.values():
            if isinstance(v, dict):
                walk(v)

    walk(params)
    size_mbit = ((total - binarized) * 32 + binarized * binary_bit) / 1e6
    return {
        "params_m": total / 1e6,
        "binarized_m": binarized / 1e6,
        "size_mbit": size_mbit,
        "size_equiv_m32": size_mbit / 32,
    }


def _dot_flops(eqn) -> int:
    d = eqn.params["dimension_numbers"]
    (lc, rc), (lb, rb) = d
    lhs = eqn.invars[0].aval.shape
    rhs = eqn.invars[1].aval.shape
    batch = int(np.prod([lhs[i] for i in lb])) if lb else 1
    contract = int(np.prod([lhs[i] for i in lc])) if lc else 1
    m = int(
        np.prod([s for i, s in enumerate(lhs) if i not in set(lc) | set(lb)])
    )
    n = int(
        np.prod([s for i, s in enumerate(rhs) if i not in set(rc) | set(rb)])
    )
    return batch * m * n * contract  # MAC count (not 2x)


def op_counts(fn, *args) -> Dict[str, float]:
    """Trace ``fn`` and classify every dot_general into MACs/ADDs/BOPs."""
    closed = jax.make_jaxpr(fn)(*args)
    totals = {"macs": 0, "adds": 0, "bops": 0}

    def signed(var, producers, depth=0):
        if depth > 12 or not hasattr(var, "count"):
            return False
        eqn = producers.get(id(var))
        if eqn is None:
            return False
        name = eqn.primitive.name
        if name == "sign":
            return True
        if name in _PASSTHROUGH:
            return signed(eqn.invars[0], producers, depth + 1)
        if name in ("mul", "add", "sub", "max", "min", "clamp", "concatenate"):
            return any(signed(v, producers, depth + 1) for v in eqn.invars)
        return False

    def walk(jaxpr):
        producers = {}
        for eqn in jaxpr.eqns:
            for o in eqn.outvars:
                producers[id(o)] = eqn
        for eqn in jaxpr.eqns:
            name = eqn.primitive.name
            if name == "dot_general":
                flops = _dot_flops(eqn)
                l = signed(eqn.invars[0], producers)
                r = signed(eqn.invars[1], producers)
                if l and r:
                    totals["bops"] += flops
                elif l or r:
                    totals["adds"] += flops
                else:
                    totals["macs"] += flops
            # recurse into call/scan/cond sub-jaxprs
            for key in ("jaxpr", "call_jaxpr", "cond_jaxpr"):
                sub = eqn.params.get(key) if hasattr(eqn, "params") else None
                if sub is not None:
                    walk(sub.jaxpr if hasattr(sub, "jaxpr") else sub)
            if hasattr(eqn, "params") and "branches" in getattr(eqn, "params", {}):
                for br in eqn.params["branches"]:
                    walk(br.jaxpr if hasattr(br, "jaxpr") else br)

    walk(closed.jaxpr)
    return {k: v / 1e6 for k, v in totals.items()}  # in millions (M ops)


def hlo_cost(fn, *args) -> Dict[str, float]:
    """XLA's own cost analysis of the compiled program (flops, bytes)."""
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {
        "flops": float(ca.get("flops", -1)),
        "bytes_accessed": float(ca.get("bytes accessed", -1)),
    }


def analyze_model(
    task: str, backbone: str, model_name: str, *, binary: bool,
    num_points: int, k: int, batch: int = 2,
) -> Dict[str, float]:
    import jax.numpy as jnp

    from svnet_tpu import models

    kw = {"k": k}
    if model_name == "svnet":
        kw["binary"] = binary
    if task == "cls":
        m = models.get_model("cls", backbone, model_name, num_classes=40, **kw)
        args = (jnp.zeros((batch, num_points, 3)),)
    else:
        m = models.get_model("partseg", backbone, model_name, num_part=50, **kw)
        args = (jnp.zeros((batch, num_points, 3)), jnp.zeros((batch, 16)))

    variables = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), *args))
    variables = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables
    )

    def fwd(*a):
        return m.apply(variables, *a, False)

    out = count_params(variables["params"])
    ops_m = op_counts(fwd, *args)
    # per-cloud numbers
    out.update({f"{kk}_m_per_cloud": vv / batch for kk, vv in ops_m.items()})
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--task", default="cls", choices=["cls", "partseg"])
    ap.add_argument("--backbone", default="dgcnn", choices=["dgcnn", "pointnet"])
    ap.add_argument("--model", default="svnet")
    ap.add_argument("--binary", action="store_true")
    ap.add_argument("--num-points", type=int, default=None)
    ap.add_argument("--k", type=int, default=None)
    args = ap.parse_args(argv)
    num_points = args.num_points or (1024 if args.task == "cls" else 2048)
    k = args.k or (20 if args.task == "cls" else 40)
    res = analyze_model(
        args.task, args.backbone, args.model,
        binary=args.binary, num_points=num_points, k=k,
    )
    print(
        f"{args.model}-{args.backbone}-{args.task}"
        f"{' (binary)' if args.binary else ''} @ N={num_points}, k={k}:"
    )
    print(
        f"  Params: {res['params_m']:.4f}M ({res['binarized_m']:.4f}M binarized,"
        f" {res['size_mbit']:.2f} Mbit = {res['size_equiv_m32']:.4f}M fp32-equiv)"
    )
    print(
        f"  per cloud: MACs {res['macs_m_per_cloud']:.1f}M | "
        f"ADDs {res['adds_m_per_cloud']:.1f}M | BOPs {res['bops_m_per_cloud']:.1f}M"
    )
    return res


if __name__ == "__main__":
    main()

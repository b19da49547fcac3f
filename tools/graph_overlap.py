"""How dynamic are the dynamic graphs? Neighbour-set overlap per round.

The graph-reuse serving knob (config.graph_reuse, docs/serving.md) swaps a
later round's feature-space kNN graph for an earlier one's. This tool
measures, on a TRAINED checkpoint, how much those graphs actually differ:
mean |top-k(A) ∩ top-k(B)| / k per point between every pair of round
graphs (xyz, conv2, conv3, conv4 input spaces — the graphs
get_graph_feature_sv builds, ops/graph.py:137-157; ref: sv_util.py:90-116).

High conv2↔conv3/conv4 overlap = 'conv2' reuse changes few edges (and the
accuracy eval should confirm); low overlap = the dynamic graph carries
real signal and reuse is a bigger semantic step.

Usage (CPU is fine — flax/XLA path, no Pallas):
    python tools/graph_overlap.py --ckpt /root/synth_v2/runs/kd100cr/\
save_models/model_best.ckpt --data-dir /root/synth_v2 [--batch 8] [--cpu]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

os.chdir(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.getcwd())

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--num-points", type=int, default=1024)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (this box's site hook "
                         "overrides JAX_PLATFORMS)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import h5py
    import jax.numpy as jnp
    import numpy as np
    from flax import serialization

    from svnet_tpu import models
    from svnet_tpu.ops import knn, svpool

    k = args.k
    files = sorted(glob.glob(os.path.join(
        args.data_dir, "modelnet40_ply_hdf5_2048", "*test*.h5")))
    assert files, f"no test h5 under {args.data_dir}"
    with h5py.File(files[0], "r") as f:
        pts = f["data"][: args.batch, : args.num_points].astype(np.float32)
    pts = jnp.asarray(pts)

    model = models.SV_DGCNN_CLS(num_classes=40, k=k, binary=True)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), pts))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)
    template = {
        "epoch": 0,
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
        "best_metric": 0.0,
    }
    with open(args.ckpt, "rb") as f:
        restored = serialization.from_bytes(template, f.read())
    variables = {
        "params": restored["params"],
        "batch_stats": restored["batch_stats"],
    }

    _, inter = jax.jit(
        lambda v, p: model.apply(
            v, p, False,
            capture_intermediates=lambda mdl, _:
                mdl.name in ("conv1", "conv2", "conv3"),
        )
    )(variables, pts)
    inter = inter["intermediates"]

    def joint(sv):
        s, v = svpool(sv)
        B, N = s.shape[0], s.shape[1]
        return jnp.concatenate([s, v.reshape(B, N, -1)], axis=-1)

    spaces = {
        "xyz": pts,
        "conv2": joint(inter["conv1"]["__call__"][0]),
        "conv3": joint(inter["conv2"]["__call__"][0]),
        "conv4": joint(inter["conv3"]["__call__"][0]),
    }
    graphs = {n: np.asarray(knn(x, k)) for n, x in spaces.items()}

    def overlap(a, b):
        B, N = a.shape[0], a.shape[1]
        inter_sz = [
            len(set(a[i, n]) & set(b[i, n]))
            for i in range(B) for n in range(N)
        ]
        return float(np.mean(inter_sz)) / k

    names = list(graphs)
    print(f"# trained-checkpoint graph overlap, B={pts.shape[0]} "
          f"N={args.num_points} k={k}  ({args.ckpt})")
    print("# rows/cols: the space each round's kNN runs in; "
          "cell = mean |∩|/k")
    print("          " + "".join(f"{n:>9}" for n in names))
    for a in names:
        row = "".join(f"{overlap(graphs[a], graphs[b]):9.3f}" for b in names)
        print(f"{a:>9} {row}")


if __name__ == "__main__":
    main()

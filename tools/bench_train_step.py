"""On-chip train-step timing: fused Pallas round vs the XLA block path.

Times the FULL jitted training step (rotation aug + forward + backward +
optimizer update) with bench.py's chained-iteration methodology — the
TrainState threads through a fori_loop of steps inside one jit, so the
per-step time is (total - tunnel roundtrip) / iters with no dispatch
overhead per step. Reference wall to beat: ~185 ms/step cls B=32 (the
torch reference's 55-60 s epoch at 9,840 clouds, BASELINE.md).

  python tools/bench_train_step.py --task cls            # fused vs xla
  python tools/bench_train_step.py --task partseg --impl fused
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

from svnet_tpu import models
from svnet_tpu.train import cal_loss, make_optimizer
from svnet_tpu.train.steps import TrainState, make_train_step

ROUNDTRIP_MS = 26.0  # measured axon-tunnel dispatch cost (PERF.md)

# clouds per reference epoch: ModelNet40 train / ShapeNetPart trainval
EPOCH_CLOUDS = {"cls": 9840, "partseg": 14007}


def setup(task, B, N, K, binary=True):
    if task == "cls":
        model = models.SV_DGCNN_CLS(num_classes=40, k=K, binary=binary)
        pts = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3))
        variables = jax.jit(model.init)(jax.random.PRNGKey(1), pts)
        batch = {"points": pts, "target": jnp.zeros((B,), jnp.int32)}
        loss_fn, with_label, recipe = cal_loss, False, "dgcnn"
    else:
        model = models.SV_DGCNN_PSEG(num_part=50, k=K, binary=binary)
        pts = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3))
        lab = jax.nn.one_hot(jnp.arange(B) % 16, 16, dtype=jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(1), pts, lab)
        batch = {
            "points": pts,
            "label": lab,
            "target": jnp.zeros((B, N), jnp.int32),
        }
        loss_fn, with_label, recipe = cal_loss, True, "dgcnn"
    tx = make_optimizer(binary=binary, lr=1e-3, epochs=10, steps_per_epoch=10,
                        recipe=recipe)
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"],
        tx=tx,
    )
    return model, state, batch, loss_fn, with_label


def make_fused(task, K, num_classes=40, binary=True):
    interp = jax.default_backend() != "tpu"
    if task == "cls":
        from svnet_tpu.train.fused import make_fused_train_apply

        return make_fused_train_apply(num_classes, K, binary=binary,
                                      interpret=interp)
    from svnet_tpu.train.fused import make_fused_train_apply_pseg

    return make_fused_train_apply_pseg(50, K, binary=binary,
                                       interpret=interp)


def bench(task, impl, B, N, K, iters, repeats, binary=True):
    model, state, batch, loss_fn, with_label = setup(task, B, N, K, binary)
    fused_apply = (make_fused(task, K, binary=binary)
                   if impl == "fused" else None)
    step = make_train_step(model, loss_fn, rot="z", with_label=with_label,
                           fused_apply=fused_apply)

    @jax.jit
    def timed(state, batch, rng):
        def body(i, c):
            st, _ = c
            st2, loss, _ = step(st, batch, jax.random.fold_in(rng, i))
            return st2, loss
        _, loss = jax.lax.fori_loop(
            0, iters, body, (state, jnp.float32(0.0))
        )
        return loss

    rng = jax.random.PRNGKey(2)
    float(timed(state, batch, rng))  # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(timed(state, batch, rng))
        times.append(time.perf_counter() - t0)
    total_ms = statistics.median(times) * 1e3
    ms = max((total_ms - ROUNDTRIP_MS) / iters, 1e-6)
    cps = B / (ms / 1e3)
    epoch = EPOCH_CLOUDS[task] / cps
    print(
        f"{task} {impl}{'' if binary else ' FP'}: {ms:.1f} ms/step "
        f"(B={B}, N={N}, k={K}) = "
        f"{cps:.0f} clouds/s, epoch@{EPOCH_CLOUDS[task]} ~ {epoch:.1f} s",
        flush=True,
    )


def ablate(task, B, N, K, iters, repeats, legs):
    """Stage-ablation legs (cls only): attribute the step cost before
    optimizing — train-mode forward, the XLA kNN, and the graph-feature
    gather fwd+bwd, each under the same chained-iteration timing."""
    from svnet_tpu import ops

    model, state, batch, loss_fn, with_label = setup(task, B, N, K)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def timeit(make_carry, body, fetch):
        @jax.jit
        def timed():
            return fetch(jax.lax.fori_loop(0, iters, body, make_carry()))

        float(timed())
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(timed())
            ts.append(time.perf_counter() - t0)
        return (statistics.median(ts) * 1e3 - ROUNDTRIP_MS) / iters

    points = batch["points"]
    if "fwd" in legs:
        def body(i, pts):
            out = model.apply(variables, pts, True,
                              rngs={"dropout": jax.random.PRNGKey(0)},
                              mutable=["batch_stats"])[0]
            return pts + 1e-12 * jnp.mean(out)

        ms = timeit(lambda: points, body,
                    lambda p: jnp.sum(model.apply(
                        variables, p, True,
                        rngs={"dropout": jax.random.PRNGKey(0)},
                        mutable=["batch_stats"])[0]))
        print(f"train-mode forward only: {ms:.1f} ms", flush=True)

    if "knn" in legs:
        joint = jax.random.normal(jax.random.PRNGKey(3), (B, N, 62))

        def body(i, x):
            idx = ops.knn(x, K)
            return x + 1e-12 * jnp.mean(idx.astype(jnp.float32))

        ms = timeit(lambda: joint, body,
                    lambda x: jnp.sum(ops.knn(x, K).astype(jnp.float32)))
        print(f"XLA knn (C=62) x1: {ms:.1f} ms", flush=True)

    if "gather" in legs:
        from svnet_tpu.ops.graph import get_graph_feature_sv

        s = jax.random.normal(jax.random.PRNGKey(4), (B, N, 32))
        v = jax.random.normal(jax.random.PRNGKey(5), (B, N, 3, 10))

        def one(sv):
            s_f, v_f = get_graph_feature_sv(sv, K)
            return jnp.mean(s_f) + jnp.mean(v_f)

        def body(i, sv):
            g = jax.grad(one)((sv[0], sv[1]))
            return (sv[0] + 1e-12 * g[0], sv[1] + 1e-12 * g[1])

        ms = timeit(lambda: (s, v), body, lambda sv: jnp.sum(sv[0][0, 0]))
        print(f"graph feature sv fwd+bwd x1: {ms:.1f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=["cls", "partseg"], default="cls")
    ap.add_argument("--impl", choices=["fused", "xla", "both"],
                    default="both")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--num-points", type=int, default=0)
    ap.add_argument("--k", type=int, default=0)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--exact-selection", choices=["update", "pair"],
                    default=None, help="training-path kNN top-k scheme A/B")
    ap.add_argument("--legs", default="",
                    help="extra stage-ablation legs: fwd,knn,gather")
    ap.add_argument("--fp", action="store_true",
                    help="bench the FULL-PRECISION model (r4 fused FP path)")
    args = ap.parse_args()
    if args.exact_selection:
        from svnet_tpu import config

        config.set_exact_selection(args.exact_selection)

    N = args.num_points or (1024 if args.task == "cls" else 2048)
    K = args.k or (20 if args.task == "cls" else 40)
    impls = ["fused", "xla"] if args.impl == "both" else [args.impl]
    for impl in impls:
        bench(args.task, impl, args.batch, N, K, args.iters, args.repeats,
              binary=not args.fp)
    if args.legs:
        ablate(args.task, args.batch, N, K, args.iters, args.repeats,
               args.legs.split(","))


if __name__ == "__main__":
    main()

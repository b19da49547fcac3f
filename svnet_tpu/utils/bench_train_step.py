"""Training-step microbenchmark + stage ablation (VERDICT r2 items 6/weak-8).

Times the FULL jitted train step (fwd + bwd + optimizer + BN stats) with
the bench.py chained-iteration methodology, plus ablation legs that
isolate the graph build (kNN), the edge gather, and the block math, so
the step cost can be attributed before optimizing.

Usage: python -m svnet_tpu.utils.bench_train_step [--batch 32]
           [--num-points 1024] [--k 20] [--legs full,fwd,knn]
"""

from __future__ import annotations

import argparse
import statistics
import time

import jax
import jax.numpy as jnp

ROUNDTRIP_MS = 26.0


def _timeit(make_carry, body, fetch, iters=8, reps=3):
    @jax.jit
    def timed():
        carry = make_carry()
        carry = jax.lax.fori_loop(0, iters, body, carry)
        return fetch(carry)

    float(timed())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(timed())
        ts.append(time.perf_counter() - t0)
    ms = statistics.median(ts) * 1e3
    return (ms - ROUNDTRIP_MS) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--num-points", type=int, default=1024)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--legs", default="full,fwd,knn,gather")
    ap.add_argument("--binary", action="store_true", default=True)
    args = ap.parse_args()
    legs = args.legs.split(",")

    from svnet_tpu import models, ops
    from svnet_tpu.train import cal_loss, make_optimizer
    from svnet_tpu.train.steps import TrainState, make_train_step

    B, N, k = args.batch, args.num_points, args.k
    model = models.SV_DGCNN_CLS(num_classes=40, k=k, binary=args.binary)
    points = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), points)
    tx = make_optimizer(binary=True, lr=1e-3, epochs=250, steps_per_epoch=100,
                        recipe="dgcnn")
    state0 = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
    )
    target = jnp.arange(B, dtype=jnp.int32) % 40
    batch = {"points": points, "target": target}
    step = make_train_step(model, cal_loss, rot="so3")

    def _run_step_leg(name, step_fn):
        def body(i, carry):
            state, rng = carry
            rng, sub = jax.random.split(rng)
            state, loss, preds = step_fn(state, batch, sub)
            return (state, rng)

        ms = _timeit(
            lambda: (state0, jax.random.PRNGKey(2)),
            body,
            lambda c: jnp.sum(c[0].params["linear3"]["bias"]),
            iters=args.iters,
        )
        print(f"{name}: {ms:.1f} ms  "
              f"({B / (ms / 1e3):.0f} clouds/s, "
              f"epoch@9840 clouds ~ {9840 / B * ms / 1e3:.1f} s)")

    if "full" in legs:
        _run_step_leg("full train step (flax/XLA)", step)

    if "fused" in legs:
        from svnet_tpu.train.fused import make_fused_train_apply

        fused_apply = make_fused_train_apply(40, k, binary=True)
        fstep = make_train_step(model, cal_loss, rot="so3",
                                fused_apply=fused_apply)
        _run_step_leg("full train step (fused Pallas)", fstep)

    if "fwd" in legs:
        def body(i, pts):
            out = model.apply(variables, pts, True,
                              rngs={"dropout": jax.random.PRNGKey(0)},
                              mutable=["batch_stats"])[0]
            return pts + 1e-12 * jnp.mean(out)

        ms = _timeit(lambda: points, body,
                     lambda p: jnp.sum(model.apply(
                         variables, p, True,
                         rngs={"dropout": jax.random.PRNGKey(0)},
                         mutable=["batch_stats"])[0]),
                     iters=args.iters)
        print(f"train-mode forward only: {ms:.1f} ms")

    if "knn" in legs:
        joint = jax.random.normal(jax.random.PRNGKey(3), (B, N, 62))

        def body(i, x):
            idx = ops.knn(x, k)
            return x + 1e-12 * jnp.mean(idx.astype(jnp.float32))

        ms = _timeit(lambda: joint, body,
                     lambda x: jnp.sum(ops.knn(x, k).astype(jnp.float32)),
                     iters=args.iters)
        print(f"XLA knn (C=62) x1: {ms:.1f} ms")

    if "gather" in legs:
        from svnet_tpu.ops.graph import get_graph_feature_sv

        s = jax.random.normal(jax.random.PRNGKey(4), (B, N, 32))
        v = jax.random.normal(jax.random.PRNGKey(5), (B, N, 3, 10))

        def one(sv):
            s_f, v_f = get_graph_feature_sv(sv, k)
            return jnp.mean(s_f) + jnp.mean(v_f)

        def body(i, sv):
            g = jax.grad(one)((sv[0], sv[1]))
            return (sv[0] + 1e-12 * g[0], sv[1] + 1e-12 * g[1])

        ms = _timeit(lambda: (s, v), body,
                     lambda sv: jnp.sum(sv[0][0, 0]), iters=args.iters)
        print(f"graph feature sv fwd+bwd x1: {ms:.1f} ms")


if __name__ == "__main__":
    main()

"""Headline benchmark: SVNet-DGCNN binary inference throughput (clouds/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the 50k clouds/s/chip North Star from
BASELINE.md (the reference publishes no throughput numbers of its own).

Usage: python bench.py [--batch B] [--num-points N] [--k K] [--iters I]
"""

import argparse
import json
import statistics
import time

import jax
import jax.numpy as jnp

NORTH_STAR = 50_000.0  # clouds/s/chip, BASELINE.md


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--num-points", type=int, default=1024)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--fp", action="store_true", help="bench the FP model")
    args = ap.parse_args()

    from svnet_tpu import models

    model = models.SV_DGCNN_CLS(
        num_classes=40, k=args.k, binary=not args.fp
    )
    points = jax.random.normal(
        jax.random.PRNGKey(0), (args.batch, args.num_points, 3)
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), points)

    @jax.jit
    def forward(variables, points):
        return model.apply(variables, points, False)

    # warmup / compile
    for _ in range(args.warmup):
        forward(variables, points).block_until_ready()

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        forward(variables, points).block_until_ready()
        times.append(time.perf_counter() - t0)

    dt = statistics.median(times)
    clouds_per_s = args.batch / dt
    print(
        json.dumps(
            {
                "metric": "svnet_dgcnn_binary_inference",
                "value": round(clouds_per_s, 1),
                "unit": f"clouds/s/chip @ {args.num_points} pts (B={args.batch}, k={args.k})",
                "vs_baseline": round(clouds_per_s / NORTH_STAR, 4),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Shared argparse flag surface (one module instead of 4 duplicated copies —
the reference duplicates ~50 flags across its four mains, SURVEY.md §5.6)."""

from __future__ import annotations

import argparse


def build_parser(task: str, backbone: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description=f"Point cloud {task} using {backbone.upper()} backbone (TPU)"
    )
    if backbone == "dgcnn":
        model_choices = ["original", "vn", "svnet"]
    else:
        model_choices = ["original", "vn", "svnet", "bipointnet"]
    p.add_argument("--model", type=str, default="svnet", choices=model_choices)
    p.add_argument("--binary", action="store_true", help="build binary nn")
    if task == "cls":
        p.add_argument(
            "--dataset", type=str, default="modelnet40",
            choices=["modelnet40", "scanobjectnn"],
        )
        p.add_argument(
            "--subset", type=str, default="hard", choices=["easy", "hard"],
            help="only for scanobjectnn",
        )
    else:
        p.add_argument("--dataset", type=str, default="shapenetpart")
        p.add_argument("--class-choice", type=str, default=None)
        p.add_argument("--subset", type=str, default="hard")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=250 if task == "cls" else 200)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--wd", type=float, default=1e-4)
    p.add_argument(
        "--num-points", type=int, default=1024 if task == "cls" else 2048
    )
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--opt", choices=["auto", "adam", "sgd"], default="auto",
                   help="optimizer override (r4): 'auto' keeps the"
                        " reference recipe (DGCNN: Adam if --binary, SGD"
                        " lr x100 otherwise); 'adam'/'sgd' force one —"
                        " useful when the epoch budget is far below the"
                        " reference's ~200-epoch runs")
    p.add_argument("--emb-dims", type=int, default=1024)
    p.add_argument("--k", type=int, default=20 if task == "cls" else 40)
    p.add_argument(
        "--rot", type=str, default="z", choices=["aligned", "z", "so3"]
    )
    p.add_argument(
        "--rot-test", type=str, default="so3", choices=["aligned", "z", "so3"]
    )
    p.add_argument(
        "--pooling", type=str, default="mean", choices=["mean", "max"],
        help="VNN only: pooling method",
    )
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--smoothing", action="store_true", default=(task == "cls"),
                   help="label smoothing in the train loss")
    p.add_argument("--test", metavar="PATH", default=None)
    p.add_argument("--resume-from", metavar="PATH", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--data-dir", metavar="DATADIR", type=str, default="data")
    p.add_argument("--save-dir", metavar="SAVEDIR", type=str, default="results")
    p.add_argument("--checkinfo", action="store_true")
    p.add_argument("--seed", type=int, default=1,
                   help="fixed default (reference used wall-clock)")
    p.add_argument("--preload", metavar="PATH", default=None,
                   help="initialize weights from a checkpoint (KD teacher)")
    p.add_argument("--distill", action="store_true",
                   help="KD: train against the frozen --preload teacher")
    p.add_argument("--kd-t", type=float, default=4.0,
                   help="KD softmax temperature (Hinton T)")
    p.add_argument("--kd-alpha", type=float, default=0.5,
                   help="KD loss mix: (1-a)*CE + a*T^2-scaled soft-CE")
    p.add_argument("--no-kd-init", dest="kd_init", action="store_false",
                   help="do NOT initialize the student from the teacher "
                        "(default: overlapping leaves are copied)")
    p.add_argument("--bn-reestimate", type=int, default=-1, metavar="N",
                   help="re-estimate BN running stats over N train batches "
                        "at fixed weights before each test eval. Binary "
                        "nets' activation distributions shift with every "
                        "weight-sign flip, so the EMA running stats are "
                        "stale mid-training (measured: epoch-59 binary ckpt "
                        "evals at 0.05 with stored stats, 0.77 after "
                        "re-estimation). -1 = auto (60 when --binary, else "
                        "0 = off)")
    p.add_argument("--profile-dir", metavar="DIR", default=None,
                   help="write a jax.profiler trace of a few train steps")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (the sanitizer story for"
                        " jitted TPU code, SURVEY.md §5.2)")
    p.add_argument(
        "--engine-mode", choices=["exact", "fast", "approx"], default="exact",
        help="fused-engine gather/selection mode (PERF.md): exact = "
             "bit-exact f32; fast = 16-bit fixed-point gather + quantized "
             "selection; approx = fast + folded-bin selection (recall ~0.96)",
    )
    p.add_argument(
        "--approx-fold", type=int, default=0, metavar="L",
        help="approx-mode selection fold width (config.set_approx_fold; "
             "0 = keep the default 256 — wider folds recover recall at "
             "large N*k, PERF.md ledger)",
    )
    p.add_argument(
        "--approx-gather-bits", type=int, default=0, choices=[0, 8, 16],
        help="approx-mode gather precision (config.set_approx_gather_bits; "
             "8 = one int8 plane, half the gather MXU cost; 0 = default 16)",
    )
    p.add_argument(
        "--fast-gather-bits", type=int, default=0, choices=[0, 8, 16],
        help="fast-mode gather precision (config.set_fast_gather_bits; "
             "8 = one int8 plane, half the gather MXU cost with fast-"
             "quality selection; 0 = default 16)",
    )
    p.add_argument(
        "--graph-reuse", choices=["none", "conv2", "spatial"], default="none",
        help="kNN graph reuse across DGCNN rounds for --fused eval "
             "(config.set_graph_reuse): conv2 = conv3/4 reuse conv2's "
             "feature-space graph; spatial = all rounds reuse the xyz graph",
    )
    p.add_argument(
        "--reuse-k", type=int, default=0, metavar="R",
        help="neighbour ranks consumed by graph-reuse rounds "
             "(config.set_reuse_k; rank-major nearest-first slice = "
             "running reuse rounds at k=R — k-subsampling semantics, "
             "certify with --test --fused before serving; needs "
             "--graph-reuse; 0 = off)",
    )
    p.add_argument(
        "--train-knobs", action="store_true",
        help="knob-aware (QAT-style) TRAINING for binary SV-DGCNN "
             "(config.set_train_knobs): the train forward simulates the "
             "serving knobs set alongside it (--graph-reuse / --reuse-k / "
             "--approx-gather-bits 8) so a checkpoint can be finetuned to "
             "certify the fast serving composition (ACCURACY.md r5)",
    )
    p.add_argument(
        "--morton-entry", action="store_true",
        help="Morton-sort clouds at fused-engine entry "
             "(config.set_morton_entry; exact — cls pooling is "
             "permutation-invariant, partseg un-permutes its logits; "
             "improves approx-fold recall and enables the block-local "
             "exact levers on any caller point order)",
    )
    p.add_argument("--fused", action="store_true",
                   help="use the fused Pallas inference engine for --test"
                        " evaluation (svnet+dgcnn only)")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel device count (shards the batch over a"
                        " mesh; the TPU-native nn.DataParallel)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel device count (column-shards the"
                        " wide kernels on the mesh's 'model' axis; composes"
                        " with --dp as a dp x tp mesh)")
    p.set_defaults(backbone=backbone)
    return p

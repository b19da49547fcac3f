"""Semantic segmentation entry point (S3DIS, BiPointNet semseg).

The reference ships the S3DIS loader and semseg model but no driver
(SURVEY.md §2.6 'unused by mains'); this completes the capability.
"""

import argparse

from svnet_tpu.train.loop import run_semseg


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="S3DIS semantic segmentation (TPU)")
    p.add_argument("--model", type=str, default="bipointnet",
                   choices=["bipointnet"])
    p.add_argument("--test-area", type=str, default="5")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--wd", type=float, default=1e-4)
    p.add_argument("--num-points", type=int, default=4096)
    p.add_argument("--rot", type=str, default="aligned",
                   choices=["aligned", "z", "so3"])
    p.add_argument("--rot-test", type=str, default="aligned",
                   choices=["aligned", "z", "so3"])
    p.add_argument("--smoothing", action="store_true")
    p.add_argument("--test", metavar="PATH", default=None)
    p.add_argument("--resume-from", metavar="PATH", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--data-dir", metavar="DATADIR", type=str, default="data")
    p.add_argument("--save-dir", metavar="SAVEDIR", type=str, default="results")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--dp", type=int, default=1)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.binary = True
    return run_semseg(args)


if __name__ == "__main__":
    main()

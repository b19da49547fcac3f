"""Entry point mirroring the reference main_partseg_pointnet.py."""

from svnet_tpu.cli.flags import build_parser
from svnet_tpu.train.loop import run_partseg


def main(argv=None):
    args = build_parser("partseg", "pointnet").parse_args(argv)
    return run_partseg(args)


if __name__ == "__main__":
    main()

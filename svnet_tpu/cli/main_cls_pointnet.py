"""Entry point mirroring the reference main_cls_pointnet.py."""

from svnet_tpu.cli.flags import build_parser
from svnet_tpu.train.loop import run_cls


def main(argv=None):
    args = build_parser("cls", "pointnet").parse_args(argv)
    return run_cls(args)


if __name__ == "__main__":
    main()

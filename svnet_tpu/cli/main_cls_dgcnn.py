"""Entry point mirroring the reference main_cls_dgcnn.py."""

from svnet_tpu.cli.flags import build_parser
from svnet_tpu.train.loop import run_cls


def main(argv=None):
    args = build_parser("cls", "dgcnn").parse_args(argv)
    return run_cls(args)


if __name__ == "__main__":
    main()

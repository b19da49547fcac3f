"""Two-file logging contract. ref utils.py:99-116.

Each run configures two loggers: a timestamped verbose log
(<name>-<timestamp>.txt with asctime prefixes) and a fixed-name epoch
summary log (<name>-log.txt, message-only) whose first line is the full
flag namespace, with greppable ``EPOCH ... | Test: ... | Train: ...`` lines
— the same downstream-tooling contract as the reference's logs/*.txt.
"""

from __future__ import annotations

import logging
import os
import time


def configure_logging(root: str, name: str, extent: str | None = None):
    os.makedirs(root, exist_ok=True)
    formatter = logging.Formatter("%(message)s")
    if extent is None:
        extent = time.strftime("%Y-%m-%d-%H-%M-%S")
        formatter = logging.Formatter("%(asctime)s - %(message)s")
    name = f"{name}-{extent}"
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        handler = logging.FileHandler(os.path.join(root, f"{name}.txt"))
        handler.setLevel(logging.INFO)
        handler.setFormatter(formatter)
        logger.addHandler(handler)

    def log_string(msg: str):
        logger.info(msg)
        print(msg)

    return log_string

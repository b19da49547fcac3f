"""Checkpoint save/load with the reference's file-management semantics.

ref utils.py:118-171: checkpoints land in <save_dir>/save_models/ as
checkpoint_%03d.ckpt, latest.txt points at the newest, model_best.ckpt is
copied on metric improvement, and the previous checkpoint is deleted unless
(saveID+1) % 20 == 0 (every-20th retention). Load precedence:
--test > --resume-from > --resume (via latest.txt).

Payload mirrors the reference (epoch, params+batch_stats, opt_state, best
metric); serialization is flax msgpack (pure-pytree, single file).
"""

from __future__ import annotations

import os
import shutil
from typing import Optional

from flax import serialization


def save_checkpoint(
    state_dict: dict,
    epoch: int,
    save_dir: str,
    is_best: bool,
    save_id: Optional[int],
    save_freq: int = 20,
) -> int:
    model_dir = os.path.join(save_dir, "save_models")
    os.makedirs(model_dir, exist_ok=True)
    filename = os.path.join(model_dir, f"checkpoint_{epoch:03d}.ckpt")

    with open(filename, "wb") as f:
        f.write(serialization.to_bytes(state_dict))
    with open(os.path.join(model_dir, "latest.txt"), "w") as f:
        f.write(filename)

    if is_best:
        shutil.copyfile(filename, os.path.join(model_dir, "model_best.ckpt"))

    if save_id is not None and (save_id + 1) % save_freq > 0:
        old = os.path.join(model_dir, f"checkpoint_{save_id:03d}.ckpt")
        if os.path.exists(old):
            os.remove(old)
    return epoch


def load_checkpoint(
    template: dict,
    save_dir: str,
    test: Optional[str] = None,
    resume_from: Optional[str] = None,
    resume: bool = False,
) -> Optional[dict]:
    """Restore into the structure of ``template`` (a state dict with the
    same pytree shape as what was saved). Returns None if nothing to load."""
    model_dir = os.path.join(save_dir, "save_models")
    latest = os.path.join(model_dir, "latest.txt")

    path = ""
    if test is not None:
        path = test
    elif resume_from is not None:
        path = resume_from
    elif resume and os.path.exists(latest):
        with open(latest) as f:
            path = f.readlines()[0].strip()

    if not path or not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())

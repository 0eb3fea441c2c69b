"""Checkpointing: params + batch stats + optimizer state + step.

Improvement over the reference (models/tracker.py:144-156), which saves only
the two module state_dicts and silently resets Adam moments on resume: we
serialize the full train state so resume is exact. Files are msgpack via
flax.serialization, named ``state_<iter>.msgpack`` with the reference's
max-iter resume scan (models/utils.py:61-68).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

from flax import serialization


def save_state(ckpt_folder: str, state: Any, step: int):
    os.makedirs(ckpt_folder, exist_ok=True)
    path = os.path.join(ckpt_folder, f"state_{step}.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))
    return path


def get_last_ckpt_iter(ckpt_folder: str) -> int:
    """Max iter among saved checkpoints, -1 if none."""
    if not os.path.isdir(ckpt_folder):
        return -1
    best = -1
    for name in os.listdir(ckpt_folder):
        m = re.match(r"state_(\d+)\.msgpack$", name)
        if m:
            best = max(best, int(m.group(1)))
    return best

def load_state(ckpt_folder: str, template: Any, step: Optional[int] = None) -> Any:
    """Restore into a pytree ``template`` (same treedef as saved)."""
    if step is None:
        step = get_last_ckpt_iter(ckpt_folder)
    if step < 0:
        raise FileNotFoundError(f"no checkpoint in {ckpt_folder}")
    path = os.path.join(ckpt_folder, f"state_{step}.msgpack")
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())

"""Checkpointing: params + batch stats + optimizer state + step.

Improvement over the reference (models/tracker.py:144-156), which saves only
the two module state_dicts and silently resets Adam moments on resume: we
serialize the full train state so resume is exact. Files are msgpack via
flax.serialization, named ``state_<iter>.msgpack`` with the reference's
max-iter resume scan (models/utils.py:61-68).

Writes are atomic (temp file + os.replace) and the auto-resume scan falls
back past unreadable files — a process killed mid-save must not poison the
next run (observed in practice: a truncated msgpack made resume die with
"Unpack failed: incomplete input").
"""

from __future__ import annotations

import logging
import os
import re
from typing import Any, Optional

from flax import serialization

logger = logging.getLogger(__name__)


def save_state(ckpt_folder: str, state: Any, step: int):
    os.makedirs(ckpt_folder, exist_ok=True)
    path = os.path.join(ckpt_folder, f"state_{step}.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(state))
    os.replace(tmp, path)  # atomic on POSIX: readers see old-or-new, never partial
    return path


class AsyncSaver:
    """Overlap checkpoint serialization with training.

    ``save_state`` fetches the full train state (params + both Adam moments)
    through the device link before writing — on the TPU relay that fetch
    stalled the train loop ~25-30 s per checkpoint (4 saves ≈ 100 s of the
    10k-iter run, the bulk of the E2E-vs-bench.py train-time gap). The train
    state is immutable and the step is NOT donated, so a daemon thread can
    run the fetch + atomic write while the loop keeps dispatching.

    ``join()`` blocks until every pending write has landed and re-raises the
    first writer failure (same contract as the preprocessing pipeline's
    async artifact saves) — callers must join before treating the run as
    complete. Atomicity/corruption guarantees are unchanged: writes still go
    through ``save_state``'s temp-file + os.replace.
    """

    def __init__(self):
        self._pending = []

    def save(self, ckpt_folder: str, state: Any, step: int):
        import threading

        slot = {"exc": None}

        def run():
            try:
                save_state(ckpt_folder, state, step)
            except BaseException as e:  # re-raised in join()
                slot["exc"] = e

        th = threading.Thread(target=run, name=f"ckpt:{step}", daemon=True)
        th.start()
        self._pending.append((th, slot))

    def join(self):
        pending, self._pending = self._pending, []
        first = None
        for th, slot in pending:
            th.join()
            if slot["exc"] is not None and first is None:
                first = slot["exc"]
        if first is not None:
            raise first


def _ckpt_iters(ckpt_folder: str):
    if not os.path.isdir(ckpt_folder):
        return []
    iters = []
    for name in os.listdir(ckpt_folder):
        m = re.match(r"state_(\d+)\.msgpack$", name)
        if m:
            iters.append(int(m.group(1)))
    return sorted(iters, reverse=True)


def get_last_ckpt_iter(ckpt_folder: str) -> int:
    """Max iter among saved checkpoints, -1 if none."""
    iters = _ckpt_iters(ckpt_folder)
    return iters[0] if iters else -1


def load_latest(ckpt_folder: str, template: Any):
    """(state, step) of the newest READABLE checkpoint, or (None, -1).

    Keeps resume's ``i`` consistent with the state actually loaded when the
    newest file is corrupt and the scan falls back.
    """
    for s in _ckpt_iters(ckpt_folder):
        try:
            return load_state(ckpt_folder, template, s), s
        except Exception as e:
            logger.warning("checkpoint state_%d unreadable (%s); falling back",
                           s, e)
    return None, -1


def load_state(ckpt_folder: str, template: Any, step: Optional[int] = None,
               fallback: bool = None) -> Any:
    """Restore into a pytree ``template`` (same treedef as saved).

    With ``step=None`` (auto-resume) an unreadable newest checkpoint is
    logged and skipped, falling back to the next-newest; an explicit
    ``step`` fails hard (``fallback`` overrides either default).
    """
    if step is not None:
        if fallback is None:
            fallback = False
        steps = [step]
    else:
        if fallback is None:
            fallback = True
        steps = _ckpt_iters(ckpt_folder)
        if not steps:
            raise FileNotFoundError(f"no checkpoint in {ckpt_folder}")
    last_err = None
    for s in steps:
        path = os.path.join(ckpt_folder, f"state_{s}.msgpack")
        try:
            with open(path, "rb") as f:
                return serialization.from_bytes(template, f.read())
        except Exception as e:  # truncated/corrupt file (e.g. killed mid-save)
            last_err = e
            if not fallback:
                raise
            logger.warning("checkpoint %s unreadable (%s); falling back", path, e)
    raise last_err

"""Profiling & observability.

The reference has no tracing/profiling at all (SURVEY §5 — tqdm bars only).
Here: stage timers with a process-wide registry, a ``jax.profiler`` trace
context for TensorBoard-compatible device traces, and a reliable device fence
for wall-clock timing (``block_until_ready`` is not a dependable fence on
remote-relay TPU platforms; fetching a scalar is).
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

_STAGE_TIMES: Dict[str, float] = defaultdict(float)
_STAGE_COUNTS: Dict[str, int] = defaultdict(int)


def device_fence(x=None):
    """Force full device completion by materializing a scalar on the host."""
    if x is None:
        x = jnp.zeros(())
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "dtype")]
    if leaves:
        float(jnp.sum(leaves[-1].ravel()[0]))


@contextlib.contextmanager
def stage_timer(name: str, fence: bool = False, log: bool = True):
    """Accumulating wall-clock timer for pipeline stages."""
    t0 = time.time()
    try:
        yield
    finally:
        if fence:
            device_fence()
        dt = time.time() - t0
        _STAGE_TIMES[name] += dt
        _STAGE_COUNTS[name] += 1
        if log:
            logger.info("[timing] %s: %.2fs (total %.1fs over %d calls)",
                        name, dt, _STAGE_TIMES[name], _STAGE_COUNTS[name])


def stage_report() -> Dict[str, dict]:
    return {k: {"total_s": round(v, 3), "calls": _STAGE_COUNTS[k]}
            for k, v in sorted(_STAGE_TIMES.items(), key=lambda kv: -kv[1])}


def reset_stage_timers():
    _STAGE_TIMES.clear()
    _STAGE_COUNTS.clear()


def dump_stage_report(path: Optional[str] = None) -> str:
    report = json.dumps(stage_report(), indent=2)
    if path:
        with open(path, "w") as f:
            f.write(report)
    return report


@contextlib.contextmanager
def device_trace(logdir: str):
    """TensorBoard-compatible device trace (jax.profiler)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", logdir)

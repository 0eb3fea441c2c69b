"""Transient-failure retry for device calls.

The aux failure-handling layer (the reference has none — SURVEY §5): remote
TPU runtimes can drop a compile/execute RPC mid-flight (transport errors,
preemptions). Pure jitted calls are safe to re-issue, so pipeline stages wrap
their device entry points in a bounded retry with backoff.
"""

from __future__ import annotations

import logging
import time
from typing import Callable, TypeVar

logger = logging.getLogger(__name__)

T = TypeVar("T")

TRANSIENT_MARKERS = ("UNAVAILABLE", "Broken pipe", "transport",
                     "DEADLINE_EXCEEDED", "Connection reset", "Socket closed")


def is_transient(err: Exception) -> bool:
    msg = str(err)
    return any(m in msg for m in TRANSIENT_MARKERS)


def retry_transient(fn: Callable[[], T], attempts: int = 3,
                    backoff_s: float = 10.0, what: str = "device call") -> T:
    """Run ``fn`` retrying transient runtime errors (pure computations only)."""
    for attempt in range(attempts):
        try:
            return fn()
        except Exception as e:  # jax.errors.JaxRuntimeError et al.
            if attempt == attempts - 1 or not is_transient(e):
                raise
            logger.warning("%s failed transiently (%s); retry %d/%d in %.0fs",
                           what, e, attempt + 1, attempts - 1, backoff_s)
            time.sleep(backoff_s * (attempt + 1))
    raise RuntimeError("unreachable")

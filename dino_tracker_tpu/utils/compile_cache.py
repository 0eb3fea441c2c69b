"""Persistent XLA compilation cache.

The per-video pipeline compiles a handful of large programs (the 24-iteration
RAFT decode, the fused train step, the ViT sweep); on this TPU setup each
compile round-trips a remote-compile service, costing minutes of fixed
overhead per process. The reference has no equivalent problem (torch eager)
— but also re-pays cuDNN autotuning per process. With the cache enabled, a
multi-video benchmark run (30 TAP-Vid videos, one process each — reference
README.md:139-154 runs one script per <VIDEO_ID>) pays every compile exactly
once: measured 279 s -> 19 s process warm-up on the second video.

Enabled automatically by every CLI / runtime entry point. Override the
location with DINO_TRACKER_TPU_CACHE=<dir>; disable with
DINO_TRACKER_TPU_CACHE=off.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_ENV = "DINO_TRACKER_TPU_CACHE"
_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache",
                        "dino_tracker_tpu", "xla")
_enabled = False


def enable_compilation_cache(path: str = None) -> str:
    """Idempotently point JAX's persistent compilation cache at ``path``
    (default ~/.cache/dino_tracker_tpu/xla, env-overridable). Must run
    before the first compile to help that compile; safe any time."""
    global _enabled
    env = os.environ.get(_ENV)
    if env is not None and env.lower() in ("off", "0", ""):
        return ""
    path = path or env or _DEFAULT
    if _enabled:
        return path
    import jax
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything: programs here are few and large, and even small
    # entries save a remote-compile round trip on this setup
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    _enabled = True
    logger.info("XLA compilation cache at %s", path)
    return path

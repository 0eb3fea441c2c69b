"""ctypes binding + lazy build for the native trajectory ops
(native/trajectory_ops.cpp). Falls back to NumPy when unavailable."""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "trajectory_ops.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libtrajectory_ops.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-pthread",
           _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning("native trajectory_ops build failed: %s",
                       getattr(e, "stderr", e))
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            if not os.path.exists(_SRC) or not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB)
        lib.occupancy_update.restype = None
        lib.occupancy_update.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
        _lib = lib
        return _lib


def occupancy_update(trajs_tk2: np.ndarray, occupied_thw: np.ndarray,
                     start: int, n_threads: int = 0) -> bool:
    """Mark occupied[f, round(y), round(x)] = True for every finite
    trajectory position at frames [start, T). ``occupied`` must be a
    C-contiguous bool array, updated in place. Returns False if the native
    library is unavailable (caller should use the NumPy path)."""
    lib = get_lib()
    if lib is None:
        return False
    t, k, _ = trajs_tk2.shape
    assert occupied_thw.dtype == np.bool_ and occupied_thw.flags.c_contiguous
    trajs = np.ascontiguousarray(trajs_tk2, np.float32)
    h, w = occupied_thw.shape[1:]
    lib.occupancy_update(
        trajs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t, k, start, h, w,
        occupied_thw.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        n_threads)
    return True

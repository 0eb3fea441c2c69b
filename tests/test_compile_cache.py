"""Persistent compilation cache wiring."""

import importlib
import os

import jax
import jax.numpy as jnp


def test_compilation_cache_populates(tmp_path, monkeypatch):
    import dino_tracker_tpu.utils.compile_cache as cc
    importlib.reload(cc)  # reset the _enabled latch from other tests
    d = str(tmp_path / "xla")
    monkeypatch.setenv("DINO_TRACKER_TPU_CACHE", d)
    assert cc.enable_compilation_cache() == d
    f = jax.jit(lambda x: (x * 3 + 1).sum())
    float(f(jnp.arange(128.0)))
    assert os.path.isdir(d) and len(os.listdir(d)) >= 1
    # idempotent
    assert cc.enable_compilation_cache() == d


def test_compilation_cache_opt_out(monkeypatch):
    import dino_tracker_tpu.utils.compile_cache as cc
    importlib.reload(cc)
    monkeypatch.setenv("DINO_TRACKER_TPU_CACHE", "off")
    assert cc.enable_compilation_cache() == ""

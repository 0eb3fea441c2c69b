"""Attribute the best-buddy pair time (19 ms/pair in r2 ≈ 7 TF/s; the
8107²×1024 affinity matmul alone is ~0.7 ms at peak, and materializing the
263 MB affinity costs ~1 ms of HBM traffic) — which stage eats the rest?

Separately-jitted variants, timed back-to-back on the TPU:

    python scripts/perf_bb_probe.py
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from dino_tracker_tpu.preprocessing.best_buddies import _mutual_nn_core

N, C, CAP = 8107, 1024, 1024
ITERS = 20


def timed(fn, *args):
    out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # fence
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.time() - t0) / ITERS * 1e3  # ms


def main():
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.standard_normal((N, C)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((N, C)).astype(np.float32))

    def normalize(x):
        return x / jnp.clip(jnp.linalg.norm(x, axis=1, keepdims=True),
                            min=1e-8)

    @jax.jit
    def matmul_only(s, t):
        aff = jnp.dot(normalize(s), normalize(t).T,
                      preferred_element_type=jnp.float32)
        return jnp.max(aff)  # force the matmul without the argmax pair

    @jax.jit
    def row_argmax(s, t):
        aff = jnp.dot(normalize(s), normalize(t).T,
                      preferred_element_type=jnp.float32)
        return jnp.argmax(aff, axis=1)

    @jax.jit
    def col_argmax(s, t):
        aff = jnp.dot(normalize(s), normalize(t).T,
                      preferred_element_type=jnp.float32)
        return jnp.argmax(aff, axis=0)

    @jax.jit
    def both_argmax(s, t):
        aff = jnp.dot(normalize(s), normalize(t).T,
                      preferred_element_type=jnp.float32)
        return jnp.argmax(aff, axis=1), jnp.argmax(aff, axis=0)

    @jax.jit
    def mutual_no_topk(s, t):
        aff = jnp.dot(normalize(s), normalize(t).T,
                      preferred_element_type=jnp.float32)
        src_max = jnp.argmax(aff, axis=1)
        tgt_max = jnp.argmax(aff, axis=0)
        rng_ = jnp.arange(aff.shape[0])
        is_bb = rng_ == tgt_max[src_max]
        cos = aff[rng_, src_max]
        return is_bb, cos

    full = jax.jit(lambda s, t: _mutual_nn_core(s, t, CAP))

    report = {
        "matmul_only_ms": round(timed(matmul_only, s, t), 2),
        "row_argmax_ms": round(timed(row_argmax, s, t), 2),
        "col_argmax_ms": round(timed(col_argmax, s, t), 2),
        "both_argmax_ms": round(timed(both_argmax, s, t), 2),
        "mutual_no_topk_ms": round(timed(mutual_no_topk, s, t), 2),
        "full_core_ms": round(timed(full, s, t), 2),
    }
    report["tf_per_s_full"] = round(2 * N * N * C / (report["full_core_ms"] / 1e3) / 1e12, 1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()

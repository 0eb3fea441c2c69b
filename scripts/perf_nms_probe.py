"""Time the BB-ambiguity NMS core at production shape (cap=1024 source
buddies x n=8107 candidates, topk=400) — lax.top_k path vs the
radix-select membership path (ops/select.py), back-to-back on the TPU:

    python scripts/perf_nms_probe.py
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from dino_tracker_tpu.ops.nms import nms_top2_peaks, same_size_box_iou

B, N, TOPK = 1024, 8107, 400
ITERS = 10


def timed(fn, *args):
    out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.time() - t0) / ITERS * 1e3


@jax.jit
def old_top_k_path(scores, coords):
    vals, idx = jax.lax.top_k(scores, TOPK)
    cand = coords[idx]
    peak1_val = vals[:, 0]
    peak1_xy = cand[:, 0]
    iou = same_size_box_iou(cand, peak1_xy[:, None, :], 30.0)
    masked = jnp.where(iou <= 0.2, vals, -jnp.inf)
    peak2 = jnp.max(masked, axis=1)
    return jnp.where(jnp.isfinite(peak2), peak2, 0.0) / peak1_val


def main():
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.standard_normal((B, N)).astype(np.float32))
    coords = jnp.asarray(
        rng.uniform(0, 850, size=(N, 2)).astype(np.float32))
    new = jax.jit(lambda s, c: nms_top2_peaks(s, c)[1])
    t_old = timed(old_top_k_path, scores, coords)
    t_new = timed(new, scores, coords)
    r_old = np.asarray(old_top_k_path(scores, coords))
    r_new = np.asarray(new(scores, coords))
    print(json.dumps({
        "old_top_k_ms": round(t_old, 2),
        "new_select_ms": round(t_new, 2),
        "speedup": round(t_old / t_new, 2),
        "max_abs_diff": float(np.abs(r_old - r_new).max()),
    }))


if __name__ == "__main__":
    main()

"""Attribute the best-buddy stage (sweep + fused OF filter + NMS ambiguity)
phase by phase at DAVIS scale with SYNTHETIC inputs — no saved artifacts
needed. The stage is the r4 preprocess dominator (E2E_r04: 203-318 s/video)
while its device compute is only ~10 s; this probe separates host grouping,
jit trace+compile, device execution, and relay fetch.

    python scripts/perf_bb_attrib.py [--t 50] [--n-traj 150000]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=50)
    ap.add_argument("--n-traj", type=int, default=150000)
    ap.add_argument("--skip-nms", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from dino_tracker_tpu.config import PreprocessConfig
    from dino_tracker_tpu.preprocessing import best_buddies as bb_lib
    from dino_tracker_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    cfg = PreprocessConfig()
    h, w, stride = cfg.video_resh, cfg.video_resw, cfg.dino_stride
    gh = 1 + (h - 14) // stride
    gw = 1 + (w - 14) // stride
    n = gh * gw
    t, c = args.t, 1024

    # smooth-ish features (low-rank + noise) so mutual-NN counts land in the
    # realistic range (~1-3k/pair; real horsejump mean was 1127, max 5828)
    t0 = time.time()
    key = jax.random.PRNGKey(args.seed)
    k1, k2, k3 = jax.random.split(key, 3)

    @jax.jit
    def gen():
        base = jax.random.normal(k1, (1, c, n), jnp.float32)
        noise = jax.random.normal(k2, (t, c, n), jnp.float32)
        return (base + 0.7 * noise).reshape(t, c, gh, gw)

    feats = gen()
    feats.block_until_ready()
    print(json.dumps({"gen_s": round(time.time() - t0, 2),
                      "shape": [t, c, gh, gw], "n_tokens": n}))

    rng = np.random.default_rng(args.seed)
    trajs = rng.random((args.n_traj, t, 2)).astype(np.float32) * [w - 1, h - 1]
    invalid = rng.random((args.n_traj, t)) < 0.6  # high NaN rate -> keep more
    trajs[invalid] = np.nan

    telemetry: dict = {}
    t0 = time.time()
    bb = bb_lib.extract_best_buddies(
        feats, h, w, stride, cap=None, progress=False,
        unfiltered_trajectories=trajs, telemetry=telemetry)
    np.asarray(bb.valid)
    print(json.dumps({"sweep_s": round(time.time() - t0, 2), **telemetry}))

    if not args.skip_nms:
        nms_tel: dict = {}
        t0 = time.time()
        bb = bb_lib.compute_bb_ambiguity(
            bb, feats, h, w, stride,
            box_size=float(cfg.dino_bb_box_size),
            iou_thresh=cfg.dino_bb_iou_threshold,
            topk=cfg.dino_bb_nms_topk, telemetry=nms_tel)
        np.asarray(bb.r)
        print(json.dumps({"nms_s": round(time.time() - t0, 2), **nms_tel}))


if __name__ == "__main__":
    main()

"""Warm cross-video inference proof (VERDICT r3 task 4).

The r3 E2E artifact showed 144.75 s for the inference stage, dominated by
one-time compiles of the multi-target kernel; the open question was whether
a multi-video benchmark run (the launcher's regime: one process, 30 DAVIS
videos sequentially) re-pays those compiles on every video — the padded
anchor axis buckets to multiples of 8 (inference/infer.py), so per-video
visible-anchor counts can spawn fresh program variants.

This script measures exactly that: a dataset root with TWO copies of a
fully-preprocessed+trained video, a 2-video benchmark pickle whose second
video uses a DIFFERENT query-point count and layout (different anchor
buckets — the adversarial case), run through ``BenchmarkLauncher`` with
stages=("inference",) in one process, timing each video. Gate: video-2
inference <= 45 s (VERDICT r3 "Next round" item 4).

Usage:
    python scripts/perf_warm_inference.py --video-dir /tmp/e2e/horsejump \
        --work-root /tmp/warm_inf --train-config ./config/train.yaml \
        [--json OUT]

``--video-dir`` must already hold preprocessing artifacts and a trained
model (e.g. the perf_e2e.py output dir). Artifacts are HARD-LINKED into
the work root (no copy cost); per-video outputs land in the linked dirs.
"""

import argparse
import json
import os
import pickle
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LINKED = ["video", "masks", "dino_embeddings", "dino_best_buddies",
          "of_trajectories", "models", "fg_masks"]


def link_copy(src, dst):
    """Hard-link the artifact tree (outputs are new files, never rewrites)."""
    os.makedirs(dst, exist_ok=True)
    for name in LINKED:
        s = os.path.join(src, name)
        if os.path.isdir(s):
            shutil.copytree(s, os.path.join(dst, name), copy_function=os.link,
                            dirs_exist_ok=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--video-dir", required=True)
    ap.add_argument("--work-root", default="/tmp/warm_inf")
    ap.add_argument("--train-config", default="./config/train.yaml")
    ap.add_argument("--query-stride", type=int, default=5)
    ap.add_argument("--json", default=None)
    ap.add_argument("--gate-seconds", type=float, default=45.0)
    args = ap.parse_args()

    import logging
    logging.basicConfig(level=logging.INFO)
    import numpy as np

    from dino_tracker_tpu.parallel.launcher import BenchmarkLauncher
    from dino_tracker_tpu.utils import video_io

    root = args.work_root
    if os.path.isdir(root):
        shutil.rmtree(root)
    for vid in ("0", "1"):
        link_copy(args.video_dir, os.path.join(root, vid))
        # per-video outputs must not alias through the hard links
        for out in ("trajectories", "occlusions"):
            d = os.path.join(root, vid, out)
            if os.path.isdir(d):
                shutil.rmtree(d)

    orig_h, orig_w, t = video_io.get_original_video_res(
        os.path.join(root, "0", "video"))
    frames = list(range(0, t, args.query_stride))
    rng = np.random.default_rng(7)

    def video_entry(idx, n_points):
        return {
            "video_idx": idx, "h": orig_h, "w": orig_w,
            "query_points": {f: (rng.random((n_points, 2))
                                 * [orig_w - 1, orig_h - 1]).tolist()
                             for f in frames},
            "target_points": {f: rng.random((n_points, t, 2))
                              * [orig_w - 1, orig_h - 1] for f in frames},
            "occluded": {f: rng.random((n_points, t)) < 0.2 for f in frames},
        }

    # video 1 gets a different point count → different visible-anchor
    # bucket sizes than video 0 (the adversarial recompile case)
    bench = {"videos": [video_entry(0, 26), video_entry(1, 19)]}
    pkl = os.path.join(root, "bench.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(bench, f)

    launcher = BenchmarkLauncher(
        dataset_root=root, benchmark_pickle_path=pkl,
        train_config_path=args.train_config,
        preprocess_config_path=args.train_config,  # unused: inference only
        stages=("inference",))

    times = {}
    for vid in launcher.video_ids():
        t0 = time.perf_counter()
        launcher.run_video(vid)
        times[vid] = round(time.perf_counter() - t0, 2)
        print(json.dumps({"video": vid, "inference_s": times[vid]}),
              flush=True)

    ok = times["1"] <= args.gate_seconds
    out = {"per_video_s": times, "gate_s": args.gate_seconds, "ok": ok,
           "note": "video 1 uses a different query-point count (19 vs 26) "
                   "to force different anchor buckets"}
    print(json.dumps(out), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

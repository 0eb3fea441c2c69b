"""Benchmark: full-fidelity training step throughput on one chip.

Measures the phase-2 jitted train step (tracking + cycle-consistency +
both contrastive losses + regularizers, backward, Adam) at the reference's
exact workload constants (854×476 video, ViT-L 1024-dim stride-7 features,
batch 512 points × 4 frames — config/train.yaml:11-17) and reports the
wall-clock for the 10k-iteration per-video test-time training run.

vs_baseline: the reference trains 10k iters on an A100 at roughly 3 it/s
(~55 min/video; the repo publishes no speed numbers — BASELINE.md — so this
is our documented estimate for a 512-point batch with ~15 CUDA kernel
launches/iter). vs_baseline = baseline_minutes / ours_minutes (>1 ⇒ faster).
"""

import json
import time

import numpy as np
import jax

BASELINE_MINUTES_10K = 55.0


def main():
    import __graft_entry__ as ge
    from dino_tracker_tpu.config import TrainConfig
    from dino_tracker_tpu.models.tracker import TrackerConfig
    from dino_tracker_tpu.training import train as train_lib

    t = 20  # frames resident; per-step cost is independent of T beyond gathers
    tcfg = TrackerConfig()  # 854×476, delta channels (3,64,128,256,1024)
    cfg = TrainConfig()     # full reference hyper-parameters
    data = ge._synthetic_video_data(t, tcfg.video_h, tcfg.video_w, 1024,
                                    bb_cap=512, n_traj=20000, tcfg=tcfg)
    state = train_lib.init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = train_lib.make_train_step(cfg, tcfg, use_cyc=True, use_cl_ref=True)

    key = jax.random.PRNGKey(0)

    def sync(m):
        # materialize a scalar on the host — block_until_ready alone is not
        # a reliable fence on the axon remote-device platform
        return float(m["loss_total"])

    # warmup / compile (two steps: the first post-compile dispatch overlaps)
    for _ in range(2):
        key, sub = jax.random.split(key)
        state, metrics = step(state, data, sub)
        sync(metrics)

    n_steps = 20
    t0 = time.time()
    for _ in range(n_steps):
        key, sub = jax.random.split(key)
        state, metrics = step(state, data, sub)
    sync(metrics)
    dt = (time.time() - t0) / n_steps

    minutes_10k = dt * 10_000 / 60.0
    print(json.dumps({
        "metric": "train_10k_iters_minutes",
        "value": round(minutes_10k, 2),
        "unit": "minutes_per_video",
        "vs_baseline": round(BASELINE_MINUTES_10K / minutes_10k, 3),
    }))


if __name__ == "__main__":
    main()

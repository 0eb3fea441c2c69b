"""Attribute the trajectories stage (the E2E preprocessing dominator).

E2E_r03: trajectories 427 s + unfiltered 121 s of the 661 s preprocess.
Expected floors from component measurements: direct decode ~94 s
(1225 pairs x ~77 ms fwd+bwd) + chaining/assembly ~121 s — leaving ~200 s
unattributed. This probe fences each sub-phase separately at real DAVIS
scale (854x476, T=50) so the gap lands on a named line:

  encode          — O(T) fnet/cnet over all frames
  adjacent        — 2(T-1) decode pairs
  direct[start]   — fwd+bwd decode + cycle mask for all f>start
  chain[start]    — _chain_from_start scan (flows already resident)
  fetch[start]    — keep mask + column gather + host fetch
  occupancy[start]— native look-behind update

Usage:
    python scripts/perf_traj_probe.py --data-path /tmp/e2e/horsejump \
        --raft-checkpoint /tmp/e2e/ckpts/raft-things.pth
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
    ap.add_argument("--data-path", required=True)
    ap.add_argument("--raft-checkpoint", required=True)
    ap.add_argument("--preprocess-config", default="./config/preprocessing.yaml")
    ap.add_argument("--starts", default="0,12,25,38,48")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    from dino_tracker_tpu.config import PreprocessConfig
    from dino_tracker_tpu.models.raft import convert_raft_state_dict
    from dino_tracker_tpu.preprocessing import trajectories as traj_lib
    from dino_tracker_tpu.preprocessing.flow import RaftFlowEngine
    from dino_tracker_tpu.utils import video_io
    from dino_tracker_tpu.utils.compile_cache import enable_compilation_cache
    from dino_tracker_tpu.utils.profiling import device_fence

    enable_compilation_cache()
    pcfg = PreprocessConfig.from_yaml(args.preprocess_config)
    sd = torch.load(args.raft_checkpoint, map_location="cpu",
                    weights_only=True)
    raft_params = convert_raft_state_dict(sd)

    video = video_io.load_video(
        os.path.join(args.data_path, "video"),
        resize=(pcfg.video_resh, pcfg.video_resw),
        num_frames=pcfg.max_frames)
    eng = RaftFlowEngine(raft_params, video, num_iters=pcfg.raft_iters,
                         compute_dtype=jnp.dtype(pcfg.raft_compute_dtype))
    t = eng.t

    def emit(name, dt, **kw):
        print(json.dumps({"phase": name, "seconds": round(dt, 3), **kw}),
              flush=True)

    t0 = time.perf_counter()
    enc = eng._encodings()
    device_fence(enc)
    emit("encode", time.perf_counter() - t0, frames=t)

    t0 = time.perf_counter()
    fwd, bwd = eng.adjacent_flows()
    device_fence((fwd, bwd))
    emit("adjacent", time.perf_counter() - t0, pairs=2 * (t - 1))

    masks = np.asarray(traj_lib.compute_flow_masks(fwd, bwd, pcfg.threshold))
    occupied = np.zeros((t, eng.h, eng.w), bool)
    starts = [int(s) for s in args.starts.split(",") if int(s) < t - 1]

    tot_direct = tot_chain = tot_fetch = tot_occ = 0.0
    weight = 0
    for start in starts:
        n_pairs = t - 1 - start
        t0 = time.perf_counter()
        dflows, dmasks = eng.direct_flows(start, pcfg.threshold)
        device_fence((dflows, dmasks))
        dt_direct = time.perf_counter() - t0
        emit("direct", dt_direct, start=start, pairs=n_pairs,
             ms_per_pair=round(1e3 * dt_direct / n_pairs, 1))

        start_mask = ~masks[start] | ~occupied[start]
        t0 = time.perf_counter()
        timeline = traj_lib._chain_from_start(
            fwd, bwd, jnp.asarray(start_mask), jnp.asarray(start, jnp.int32),
            dflows, dmasks, threshold=pcfg.threshold, use_direct=True,
            direct_threshold=pcfg.direct_flow_threshold)
        device_fence(timeline)
        dt_chain = time.perf_counter() - t0
        emit("chain", dt_chain, start=start)

        t0 = time.perf_counter()
        keep = np.asarray(traj_lib._keep_mask(
            timeline, pcfg.min_trajectory_length))
        ki = np.flatnonzero(keep.ravel())
        trajs = None
        if ki.size:
            cap = max(1024, 1 << int(np.ceil(np.log2(ki.size))))
            idx = np.zeros(min(cap, eng.h * eng.w), np.int32)
            idx[: ki.size] = ki
            trajs = np.asarray(traj_lib._gather_columns(
                timeline, jnp.asarray(idx)))[:, : ki.size, :]
        dt_fetch = time.perf_counter() - t0
        emit("fetch", dt_fetch, start=start, kept=int(ki.size))

        dt_occ = 0.0
        if trajs is not None:
            from dino_tracker_tpu.utils.native_traj import occupancy_update
            t0 = time.perf_counter()
            occupancy_update(trajs, occupied, start)
            dt_occ = time.perf_counter() - t0
            emit("occupancy", dt_occ, start=start)

        tot_direct += dt_direct
        tot_chain += dt_chain
        tot_fetch += dt_fetch
        tot_occ += dt_occ
        weight += n_pairs

    # extrapolate to the full sweep: direct scales with pair count
    # (T(T-1)/2 total); chain/fetch/occ scale with start count (T-1)
    n_starts = len(starts)
    full_pairs = t * (t - 1) // 2
    est = {
        "direct_s": round(tot_direct / weight * full_pairs, 1),
        "chain_s": round(tot_chain / n_starts * (t - 1), 1),
        "fetch_s": round(tot_fetch / n_starts * (t - 1), 1),
        "occupancy_s": round(tot_occ / n_starts * (t - 1), 1),
    }
    est["total_estimate_s"] = round(sum(est.values()), 1)
    print(json.dumps({"extrapolated_full_sweep": est}), flush=True)


if __name__ == "__main__":
    main()

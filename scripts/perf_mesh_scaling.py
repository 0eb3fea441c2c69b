"""Virtual-mesh sharding-overhead measurement (VERDICT r3 task 5).

Real multi-chip hardware is not available here, and the host has ONE CPU
core — so an 8-virtual-device CPU mesh cannot demonstrate *speedup*. What
it CAN demonstrate, and what this script measures, is the converse spec:
a correctly partitioned SPMD program does the SAME TOTAL WORK regardless
of mesh size, so on a single core its wall clock at n=8 must be ≈ its
wall clock at n=1 (modulo collective/partition overhead). A stage whose
sharding serializes — e.g. an all-gather that materializes the full array
on every device followed by replicated compute — does up to 8× the work
and fails the ratio gate.

Gate: t(mesh=8) / t(mesh=1) <= RATIO_MAX per stage (default 1.6 — allows
partition bookkeeping + small collectives, catches any replicated-compute
blowup). Exit code 1 if any stage fails.

Stages covered (the four intra-video sharded paths, same entry points the
driver's dryrun exercises, at larger-than-dryrun shapes so timing is not
dispatch noise):
  * fused train step (all six losses) — batch/frame axes over ``data``
  * best-buddy pair sweep — frame-pair axis over ``data``
  * RAFT adjacent flow pairs — pair axis over ``data``
  * inference flat prediction batch — (query × frame) axis over ``data``

Usage:  python scripts/perf_mesh_scaling.py [--json OUT]
(self-forces the CPU platform + 8 virtual devices; safe with the relay down)
"""

import argparse
import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

RATIO_MAX = 1.6
REPS = 3


def _time(fn, reps=REPS):
    fn()  # warmup/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def stage_train(mesh):
    import __graft_entry__ as ge
    from dino_tracker_tpu.config import TrainConfig
    from dino_tracker_tpu.models.tracker import TrackerConfig
    from dino_tracker_tpu.training import train as train_lib

    n = mesh.devices.size
    # shapes sized so per-op DEVICE compute dominates the single-core host's
    # per-device dispatch work — tiny shapes make every stage look
    # "serialized" (host dispatch × n) even when the partitioning is perfect
    t, h, w, c = 8, 140, 196, 32
    tcfg = TrackerConfig(video_h=h, video_w=w, delta_channels=(3, 8, 8, 8, c))
    cfg = TrainConfig(train_batch_size=512, batch_n_frames=4,
                      cyc_n_frames=2, cyc_batch_size_per_frame=64,
                      cl_n_frames=2, cl_points_per_pair=64)
    data = ge._synthetic_video_data(t, h, w, c, bb_cap=16, n_traj=400,
                                    tcfg=tcfg)
    state = train_lib.init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = train_lib.make_train_step(cfg, tcfg, use_cyc=True, use_cl_ref=True,
                                     mesh=mesh)
    key = jax.random.PRNGKey(1)

    def run():
        with mesh:
            new_state, _ = step(state, data, key)
        jax.block_until_ready(new_state.params)
    return _time(run)


def stage_bb(mesh):
    from dino_tracker_tpu.preprocessing import best_buddies as bb_lib
    rng = np.random.default_rng(1)
    # token grid for 140×196 at stride 7 / patch 14: 19×27
    feats = jnp.asarray(rng.standard_normal((8, 32, 19, 27)).astype(np.float32))

    def run():
        bb = bb_lib.extract_best_buddies(feats, 140, 196, stride=7, cap=32,
                                         mesh=mesh)
        jax.block_until_ready(bb.valid)
    return _time(run)


def stage_raft(mesh):
    from dino_tracker_tpu.models import raft as raft_lib
    from dino_tracker_tpu.preprocessing.flow import RaftFlowEngine
    rng = np.random.default_rng(2)
    frames = rng.random((9, 3, 72, 96)).astype(np.float32)
    eng = RaftFlowEngine(raft_lib.init_raft(jax.random.PRNGKey(2)), frames,
                         num_iters=4, mesh=mesh)

    def run():
        eng._adj = None  # adjacent_flows caches its result; re-time the sweep
        fwd, bwd = eng.adjacent_flows()
        assert np.isfinite(np.asarray(fwd)).all()
        assert np.isfinite(np.asarray(bwd)).all()
    return _time(run)


def stage_inference(mesh):
    from dino_tracker_tpu.inference.infer import ModelInference
    from dino_tracker_tpu.models import tracker as tracker_lib
    from dino_tracker_tpu.models.tracker import TrackerConfig
    rng = np.random.default_rng(3)
    t, h, w, c = 16, 140, 196, 32
    tcfg = TrackerConfig(video_h=h, video_w=w, delta_channels=(3, 8, 8, 8, c))
    params, stats = tracker_lib.init_tracker(jax.random.PRNGKey(3), tcfg)
    video = jnp.asarray(rng.random((t, 3, h, w), dtype=np.float32))
    dino = jnp.asarray(rng.standard_normal(
        (t, c, *tcfg.feat_hw)).astype(np.float32))
    refined = tracker_lib.cache_refined_embeddings(
        params, stats, video, dino, tcfg, frames_chunk=8, mesh=mesh)
    mi = ModelInference(params=params, refined_features=refined, cfg=tcfg,
                        chunk=512, mesh=mesh)
    qp = np.stack([rng.random(64) * (w - 1), rng.random(64) * (h - 1),
                   rng.integers(0, t, 64)], -1).astype(np.float32)

    def run():
        trajs, _ = mi.infer(qp)
        assert np.isfinite(trajs).all()
    return _time(run)


STAGES = [("train_step", stage_train), ("bb_sweep", stage_bb),
          ("raft_pairs", stage_raft), ("inference_batch", stage_inference)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from dino_tracker_tpu.parallel.mesh import make_mesh
    assert len(jax.devices()) >= 8, "need 8 virtual cpu devices"

    rows, ok = [], True
    for name, fn in STAGES:
        t1 = fn(make_mesh(1))
        t8 = fn(make_mesh(8))
        ratio = t8 / t1
        passed = ratio <= RATIO_MAX
        ok &= passed
        rows.append({"stage": name, "t_mesh1_s": round(t1, 3),
                     "t_mesh8_s": round(t8, 3), "ratio": round(ratio, 2),
                     "pass": passed})
        print(f"{name:16s}  mesh1={t1:7.3f}s  mesh8={t8:7.3f}s  "
              f"ratio={ratio:5.2f}  {'ok' if passed else 'FAIL'}", flush=True)

    out = {"ratio_max": RATIO_MAX, "reps": REPS, "stages": rows, "ok": ok}
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

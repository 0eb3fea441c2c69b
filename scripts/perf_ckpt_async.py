"""A/B-measure interval-checkpoint overhead: sync save vs AsyncSaver.

Round-4 note in PERF.md claimed ~25-30 s/save of relay fetch serialized
into the train loop, fixed by ``checkpoint.AsyncSaver`` — analytically.
This measures it: three back-to-back runs of the SAME fused train chunks
(production shapes, same compiled program) differing only in the save
policy between chunks:

  base   : no saves
  sync   : ``save_state`` (blocking fetch+write) after chunks 2/4/6
  async  : ``AsyncSaver.save`` at the same points + ``join()`` at the end

    python scripts/perf_ckpt_async.py [--chunks 8] [--steps-per-call 25]

Prints one JSON line with the three wall-clocks and the per-save overhead.
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--steps-per-call", type=int, default=25)
    ap.add_argument("--save-every", type=int, default=2)
    args = ap.parse_args()

    import bench as bench_mod
    from dino_tracker_tpu.config import TrainConfig
    from dino_tracker_tpu.models.tracker import TrackerConfig
    from dino_tracker_tpu.training import checkpoint as ckpt_lib
    from dino_tracker_tpu.training import train as train_lib
    from dino_tracker_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = TrainConfig()
    tcfg = TrackerConfig(video_h=cfg.video_resh, video_w=cfg.video_resw,
                         dino_patch_size=cfg.dino_patch_size, stride=cfg.stride,
                         delta_channels=(3, 64, 128, 256, cfg.dino_embed_dim),
                         compute_dtype=cfg.compute_dtype)
    data = bench_mod.synthetic_video_data_on_device(50, tcfg)
    state0 = train_lib.init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = train_lib.make_train_step(cfg, tcfg, use_cyc=True, use_cl_ref=True,
                                     steps_per_call=args.steps_per_call)

    key = jax.random.PRNGKey(0)
    # compile + warm (also hits the persistent cache across processes)
    state = state0
    for _ in range(2):
        key, sub = jax.random.split(key)
        state, metrics = step(state, data, sub)
    jax.block_until_ready(metrics["loss_total"])

    tmp = tempfile.mkdtemp(prefix="ckpt_ab_")
    save_points = set(range(args.save_every, args.chunks, args.save_every))

    def run(policy: str) -> float:
        nonlocal key
        st = state
        folder = os.path.join(tmp, policy)
        saver = ckpt_lib.AsyncSaver()
        t0 = time.monotonic()
        for c in range(args.chunks):
            key, sub = jax.random.split(key)
            st, m = step(st, data, sub)
            if c in save_points:
                if policy == "sync":
                    ckpt_lib.save_state(folder, st, c)
                elif policy == "async":
                    saver.save(folder, st, c)
        saver.join()
        jax.block_until_ready(m["loss_total"])
        return time.monotonic() - t0

    out = {}
    for policy in ("base", "sync", "async", "base2"):
        t = run("base" if policy == "base2" else policy)
        out[policy] = round(t, 2)
        print(f"  {policy}: {t:.2f} s", file=sys.stderr, flush=True)

    n_saves = len(save_points)
    base = min(out["base"], out["base2"])
    out.update({
        "n_saves": n_saves,
        "iters": args.chunks * args.steps_per_call,
        "sync_overhead_per_save_s": round((out["sync"] - base) / n_saves, 2),
        "async_overhead_per_save_s": round((out["async"] - base) / n_saves, 2),
    })
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

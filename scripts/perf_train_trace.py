"""Device-trace the production train step and attribute ms/iter to named ops.

Round-3 verdict: the step is pinned at ~164 ms/iter (MFU 12.45%) and FLOP
cuts bought nothing — "bandwidth/latency-bound" needs a trace, not more
ablations. This captures a ``jax.profiler`` trace of the fused train chunk
at production shape and converts the xplane via xprof's ``hlo_stats`` tool
into a per-op self-time table, grouped into readable buckets (DeltaDINO
convs, corr einsums, BN, casts/transposes, head, sampler, Adam, ...).

    python scripts/perf_train_trace.py [--steps-per-call 5] [--calls 2]

Writes the raw hlo_stats table to /tmp/train_trace_hlo_stats.json and
prints a grouped summary (ms per fused call and per iteration).
"""

import argparse
import collections
import glob
import json
import os
import re
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def capture(steps_per_call: int, calls: int, logdir: str):
    import bench as bench_mod
    from dino_tracker_tpu.config import TrainConfig
    from dino_tracker_tpu.models.tracker import TrackerConfig
    from dino_tracker_tpu.training import train as train_lib
    from dino_tracker_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    t = 50
    cfg = TrainConfig()
    tcfg = TrackerConfig(video_h=cfg.video_resh, video_w=cfg.video_resw,
                         dino_patch_size=cfg.dino_patch_size,
                         stride=cfg.stride,
                         delta_channels=(3, 64, 128, 256, cfg.dino_embed_dim),
                         compute_dtype=cfg.compute_dtype)
    data = bench_mod.synthetic_video_data_on_device(t, tcfg)
    state = train_lib.init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = train_lib.make_train_step(cfg, tcfg, use_cyc=True, use_cl_ref=True,
                                     steps_per_call=steps_per_call)
    key = jax.random.PRNGKey(0)
    for _ in range(2):  # compile + warm
        key, sub = jax.random.split(key)
        state, metrics = step(state, data, sub)
        float(metrics["loss_total"])

    t0 = time.time()
    jax.profiler.start_trace(logdir)
    try:
        for _ in range(calls):
            key, sub = jax.random.split(key)
            state, metrics = step(state, data, sub)
        float(metrics["loss_total"])
    finally:
        jax.profiler.stop_trace()
    wall = time.time() - t0
    print(json.dumps({"wall_s": round(wall, 3), "calls": calls,
                      "ms_per_iter_walled": round(
                          1e3 * wall / (calls * steps_per_call), 2)}))


GROUPS = [
    ("conv", r"convolution|conv_general"),
    ("matmul/einsum", r"\bdot\b|dot_general|einsum"),
    ("scatter", r"scatter"),
    ("gather", r"gather|dynamic_slice"),
    ("reduce", r"reduce"),
    ("copy/transpose/cast", r"copy|transpose|convert|bitcast|reshape|broadcast"),
    ("fusion(elementwise)", r"fusion|add|multiply|subtract|divide|select"),
    ("rng", r"rng|threefry"),
    ("allreduce/collective", r"all-reduce|all-gather|collective"),
]


def summarize(logdir: str, steps_per_call: int, calls: int):
    from xprof.convert import raw_to_tool_data

    paths = sorted(glob.glob(os.path.join(
        logdir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        print("NO xplane.pb found under", logdir)
        return
    data, _ = raw_to_tool_data.xspace_to_tool_data([paths[-1]], "hlo_stats",
                                                   {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    out_path = "/tmp/train_trace_hlo_stats.json"
    with open(out_path, "w") as f:
        f.write(data)
    tbl = json.loads(data)
    # gviz table: columns under 'cols', rows under 'rows'
    cols = [c.get("label") or c.get("id") for c in tbl["cols"]]
    rows = [[c.get("v") for c in r["c"]] for r in tbl["rows"]]

    def col(name_sub):
        for i, c in enumerate(cols):
            if name_sub.lower() in str(c).lower():
                return i
        return None

    i_cat = col("category") or col("hlo op name") or 0
    i_name = col("hlo op name") if col("hlo op name") is not None else 0
    i_time = None
    for cand in ("total time (us)", "self time (us)", "avg. time (us)",
                 "occurrences * avg time"):
        i_time = col(cand)
        if i_time is not None:
            break
    if i_time is None:
        print("columns:", cols)
        return
    agg = collections.Counter()
    names = collections.Counter()
    for r in rows:
        cat = str(r[i_cat])
        t_us = float(r[i_time] or 0.0)
        agg[cat] += t_us
        names[f"{cat} :: {str(r[i_name])[:90]}"] += t_us
    total = sum(agg.values())
    n_iter = steps_per_call * calls
    print(f"\ntotal device time {total/1e3:.1f} ms over {n_iter} iters "
          f"-> {total/1e3/n_iter:.2f} ms/iter attributed")
    print("\nby category (ms/iter):")
    for cat, us in agg.most_common(20):
        print(f"  {us/1e3/n_iter:8.2f}  {cat}")
    print("\ntop 25 ops (ms/iter):")
    for name, us in names.most_common(25):
        print(f"  {us/1e3/n_iter:8.2f}  {name}")
    print("\nraw table saved to", out_path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps-per-call", type=int, default=5)
    ap.add_argument("--calls", type=int, default=2)
    ap.add_argument("--logdir", default="/tmp/train_trace")
    ap.add_argument("--summarize-only", action="store_true")
    args = ap.parse_args()
    if not args.summarize_only:
        capture(args.steps_per_call, args.calls, args.logdir)
    summarize(args.logdir, args.steps_per_call, args.calls)


if __name__ == "__main__":
    main()

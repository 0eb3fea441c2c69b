"""A/B the blurpool implementation inside the FULL production train step.

Same protocol as the driver bench (fused 25-step chunk, interleaved repeat
blocks to bound relay drift): blurpool_impl "matmul" (current default) vs
"pallas" (ops/blurpool.py stencil kernels).

    python scripts/perf_blurpool_ab.py [--repeats 4]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--calls", type=int, default=2)
    args = ap.parse_args()

    import bench as bench_mod
    from dino_tracker_tpu.config import TrainConfig
    from dino_tracker_tpu.models.tracker import TrackerConfig
    from dino_tracker_tpu.training import train as train_lib
    from dino_tracker_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = TrainConfig()
    t = 50

    def build(impl):
        tcfg = TrackerConfig(video_h=cfg.video_resh, video_w=cfg.video_resw,
                             dino_patch_size=cfg.dino_patch_size,
                             stride=cfg.stride,
                             delta_channels=(3, 64, 128, 256,
                                             cfg.dino_embed_dim),
                             compute_dtype=cfg.compute_dtype,
                             blurpool_impl=impl)
        data = bench_mod.synthetic_video_data_on_device(t, tcfg)
        state = train_lib.init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
        step = train_lib.make_train_step(cfg, tcfg, use_cyc=True,
                                         use_cl_ref=True,
                                         steps_per_call=cfg.steps_per_call)
        return step, state, data

    variants = {}
    for impl in ("matmul", "pallas"):
        step, state, data = build(impl)
        key = jax.random.PRNGKey(0)
        for _ in range(2):  # compile + warm
            key, sub = jax.random.split(key)
            state, metrics = step(state, data, sub)
            float(metrics["loss_total"])
        variants[impl] = (step, state, data)
        print(f"compiled {impl}", flush=True)

    times = {k: [] for k in variants}
    for _ in range(args.repeats):
        for impl, (step, state, data) in variants.items():
            key = jax.random.PRNGKey(1)
            t0 = time.time()
            for _ in range(args.calls):
                key, sub = jax.random.split(key)
                state, metrics = step(state, data, sub)
            float(metrics["loss_total"])
            times[impl].append(
                (time.time() - t0) / (args.calls * cfg.steps_per_call) * 1e3)

    out = {impl: {"ms_per_iter_median": sorted(v)[len(v) // 2],
                  "all": [round(x, 2) for x in v]}
           for impl, v in times.items()}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

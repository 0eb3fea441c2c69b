"""On-chip A/B of the TrackerConfig perf-choice fields (VERDICT r4 item 1).

Round-5 history: the four round-4 end-of-round micro-optimizations landed as
env-var toggles with no recorded A/B of the committed state, and the driver
bench regressed 165.7 -> 218.35 ms/iter. Phase 1 of this script (run with the
env-var code, raw log /tmp/toggle_ab.json, PERF.md round-5) found the cause:
the "flat row take" frame gather cost +84 ms/iter (218.5 vs 134.3 with the
plain gather); the other three toggles were each within +-1.6 ms. The plain
gather is now the only code path, and the remaining three choices are
TrackerConfig fields, which this script ablates on the fast-gather baseline
with the EXACT bench.py protocol (fused 25-step production train step,
DAVIS shapes, host-fenced timing), interleaving variants round-robin across
>= 4 repeat blocks so relay drift hits every variant equally.

Usage: python scripts/perf_toggle_ab.py [n_rounds] [n_calls_per_block]
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from dino_tracker_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import bench


def main():
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_calls = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from dino_tracker_tpu.config import TrainConfig
    from dino_tracker_tpu.models.tracker import TrackerConfig
    from dino_tracker_tpu.training import train as train_lib

    t = 50
    cfg = TrainConfig()
    base = TrackerConfig(video_h=cfg.video_resh, video_w=cfg.video_resw,
                         dino_patch_size=cfg.dino_patch_size, stride=cfg.stride,
                         delta_channels=(3, 64, 128, 256, cfg.dino_embed_dim),
                         compute_dtype=cfg.compute_dtype)
    data = bench.synthetic_video_data_on_device(t, base)
    state = train_lib.init_train_state(jax.random.PRNGKey(0), cfg, base)

    variants = [
        ("default", base),
        ("blurpool=conv", dataclasses.replace(base, blurpool_impl="conv")),
        ("reflect_pad_vjp=off", dataclasses.replace(base,
                                                    reflect_pad_vjp=False)),
        ("bias_stopgrad=off", dataclasses.replace(base, bias_stopgrad=False)),
        # phase-1 marginal winners combined (interaction check)
        ("combo:conv+nostopgrad", dataclasses.replace(
            base, blurpool_impl="conv", bias_stopgrad=False)),
    ]

    key0 = jax.random.PRNGKey(0)

    def build_and_warm(tcfg):
        step = train_lib.make_train_step(cfg, tcfg, use_cyc=True,
                                         use_cl_ref=True,
                                         steps_per_call=cfg.steps_per_call)
        st = state
        k = key0
        for _ in range(2):  # compile + post-compile overlap flush
            k, sub = jax.random.split(k)
            st, metrics = step(st, data, sub)
            float(metrics["loss_total"])  # host fence
        return step

    steps = {}
    for name, tcfg in variants:
        t0 = time.time()
        steps[name] = build_and_warm(tcfg)
        print(f"# traced+warmed {name} in {time.time()-t0:.1f}s",
              file=sys.stderr, flush=True)

    results = {name: [] for name, _ in variants}
    for r in range(n_rounds):
        for name, _ in variants:
            step = steps[name]
            st, k = state, jax.random.PRNGKey(r + 1)
            # one unmeasured call to flush dispatch overlap
            k, sub = jax.random.split(k)
            st, metrics = step(st, data, sub)
            float(metrics["loss_total"])
            t0 = time.time()
            for _ in range(n_calls):
                k, sub = jax.random.split(k)
                st, metrics = step(st, data, sub)
            float(metrics["loss_total"])
            ms = (time.time() - t0) / (n_calls * cfg.steps_per_call) * 1e3
            results[name].append(round(ms, 2))
            print(f"# round {r} {name}: {ms:.2f} ms/iter",
                  file=sys.stderr, flush=True)

    summary = {}
    for name, vals in results.items():
        summary[name] = {"ms_per_iter": vals, "min": min(vals),
                         "median": sorted(vals)[len(vals) // 2]}
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()

"""Marginal cost of each train-step loss term at production shape.

The r2 breakdown (perf_train_breakdown.py) timed components in isolation;
this probe times the real composed grad step with loss terms toggled, so
the DIFFERENCES attribute the ~60 ms of non-DeltaDINO work in the 163 ms
phase-2 step (VERDICT r3 item 4):

  sampler      — sample_batch alone
  of           — grad(huber(of)) only           (floor + of corr/head)
  p1           — of + cl_dino + regs            (phase-1 step)
  p1cyc        — p1 + cycle gen + cycle loss
  full         — p1 + cycle + cl_ref            (phase-2 step)

Each variant runs as a 10-step fused scan (dispatch amortized), slope
reported per step. Synthetic data at T=50, 476x854, batch 512.

Usage: python scripts/perf_train_ablate.py [--scan 10 --reps 3]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--t", type=int, default=50)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes + tiny batch (CPU API smoke test)")
    ap.add_argument("--variants", nargs="*",
                    default=["sampler", "of", "p1", "p1gen", "p1cyc", "full"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dino_tracker_tpu.config import TrainConfig
    from dino_tracker_tpu.models import tracker
    from dino_tracker_tpu.models.tracker import TrackerConfig, TrackerInput
    from dino_tracker_tpu.structures import BBData
    from dino_tracker_tpu.training import contrastive, cycle, losses
    from dino_tracker_tpu.training import train as train_lib
    from dino_tracker_tpu.training.sampler import (TrajectoryBank,
                                                   sample_batch)
    from dino_tracker_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    cfg = TrainConfig()
    if args.smoke:
        cfg = TrainConfig(video_resh=70, video_resw=112, train_batch_size=16,
                          batch_n_frames=2, cyc_n_frames=2,
                          cyc_batch_size_per_frame=8, cl_n_frames=2,
                          cl_points_per_pair=8, bb_max_pairs_per_frame_pair=32,
                          compute_dtype="float32")
        args.t = min(args.t, 6)
    tcfg = TrackerConfig(video_h=cfg.video_resh, video_w=cfg.video_resw,
                         compute_dtype=cfg.compute_dtype)
    if args.smoke:
        import dataclasses as _dc
        tcfg = _dc.replace(tcfg, delta_channels=(3, 4, 4, 4, 16))
    t = args.t
    h, w = cfg.video_resh, cfg.video_resw
    fh, fw = tcfg.feat_hw
    rng = np.random.default_rng(0)

    video = jnp.asarray(rng.random((t, 3, h, w), dtype=np.float32))
    # DeltaDINO's residual channel count == the DINO embedding dim
    dino = jnp.asarray(rng.random((t, tcfg.delta_channels[-1], fh, fw),
                                  dtype=np.float32))
    fg = jnp.asarray((rng.random((t, h, w)) > 0.7).astype(np.float32))

    def mk_bank(n):
        xy = rng.random((n, t, 2), np.float32) * [w - 1, h - 1]
        valid = rng.random((n, t)) > 0.3
        valid[:, 0] = True
        valid[:, 1] = True
        return TrajectoryBank(jnp.asarray(xy), jnp.asarray(valid),
                              jnp.asarray(n, jnp.int32))

    cap = cfg.bb_max_pairs_per_frame_pair
    bb = BBData(jnp.asarray(rng.random((t, t, cap, 2), np.float32) * 400),
                jnp.asarray(rng.random((t, t, cap, 2), np.float32) * 400),
                jnp.asarray(rng.random((t, t, cap), np.float32)),
                jnp.ones((t, t, cap), jnp.float32),
                jnp.asarray(rng.random((t, t, cap)) > 0.5))
    data = train_lib.VideoData(video, dino, fg, bb, mk_bank(4096), mk_bank(4096))

    key0 = jax.random.PRNGKey(0)
    params, batch_stats = tracker.init_tracker(key0, tcfg)
    video_len = t

    def make_step(use_of, use_cl_dino, use_cyc, use_cl_ref,
                  cyc_gen_only=False):
        def body(data, carry, k):
            params = carry
            k_sample, k_cyc, k_cl_dino, k_cl_ref = jax.random.split(k, 4)
            sample = sample_batch(k_sample, data.fg_bank, data.bg_bank,
                                  cfg.train_batch_size, cfg.batch_n_frames,
                                  cfg.fg_traj_ratio, video_len,
                                  cfg.video_resw, cfg.video_resh)
            inp = TrackerInput(sample.t1_points, sample.source_frame_indices,
                               sample.target_frame_indices, sample.frames_set_t)
            labels = sample.t2_points_normalized[:, :2]

            def loss_fn(p):
                refined, _, raw, _ = tracker.get_refined_embeddings(
                    p, batch_stats, data.video, data.dino_embed,
                    sample.frames_set_t, tcfg, train=True)
                view = tracker.make_frame_view(refined,
                                               jnp.dtype(tcfg.compute_dtype))
                total = jnp.asarray(0.0)
                if use_of:
                    coords = tracker.get_point_predictions(p, inp, refined,
                                                           tcfg, view=view)
                    total += jnp.mean(losses.huber(coords, labels))
                if use_cyc:
                    cyc_data = cycle.generate_cycle_data(
                        k_cyc, p, refined, sample.frames_set_t, data.fg_masks,
                        tcfg, cfg.cyc_n_frames, cfg.cyc_batch_size_per_frame,
                        cfg.cyc_fg_points_ratio, cfg.cyc_thresh, view=view)
                    if cyc_gen_only:
                        # consume gen outputs without the graded re-predict:
                        # isolates the no-grad generation cost from the
                        # cycle loss's fwd+bwd
                        total += 1e-12 * jnp.sum(cyc_data.dists
                                                 * cyc_data.valid)
                    else:
                        total += cfg.lambda_cyc * cycle.cycle_consistency_loss(
                            p, refined, sample.frames_set_t, cyc_data, tcfg,
                            cfg.cyc_gamma, view=view,
                            group_size=cfg.cyc_batch_size_per_frame)
                if use_cl_ref:
                    total += (cfg.lambda_cl_ref_bb
                              * contrastive.refined_bb_contrastive_loss(
                                  k_cl_ref, refined, sample.frames_set_t,
                                  data.fg_masks, tcfg, cfg.cl_n_frames,
                                  cfg.cl_points_per_pair, cfg.cl_fg_points_ratio,
                                  cfg.cl_temp, cfg.cl_div_ref_bb, view=view))
                if use_cl_dino:
                    total += (cfg.lambda_cl_dino_bb
                              * contrastive.dino_bb_contrastive_loss(
                                  k_cl_dino, refined, sample.frames_set_t,
                                  data.bb, data.fg_masks, tcfg, cfg.cl_n_frames,
                                  cfg.cl_points_per_pair, cfg.cl_fg_points_ratio,
                                  cfg.cl_temp, cfg.cl_div_dino_bb,
                                  cfg.bb_amb_sig_a, cfg.bb_amb_sig_b,
                                  view=view))
                    total += (cfg.lambda_emb_norm
                              * losses.emb_norm_regularization(refined, raw)
                              + cfg.lambda_angle
                              * losses.emb_angle_regularization(refined, raw))
                return total

            grads = jax.grad(loss_fn)(params)
            # consume grads into the carry so nothing is DCE'd
            params = jax.tree.map(lambda a, g: a - 0.0 * g, params, grads)
            return params, None

        @jax.jit
        def run(params, data, key):
            # data enters as an ARGUMENT: closing over the ~1.9 GB
            # VideoData bakes it into the program as constants, which the
            # remote-compile relay then ships per compile (PERF.md rule 5)
            keys = jax.random.split(key, args.scan)
            params, _ = jax.lax.scan(functools.partial(body, data),
                                     params, keys)
            return params
        return run

    @jax.jit
    def sampler_only(params, data, key):
        def body(carry, k):
            s = sample_batch(k, data.fg_bank, data.bg_bank,
                             cfg.train_batch_size, cfg.batch_n_frames,
                             cfg.fg_traj_ratio, video_len,
                             cfg.video_resw, cfg.video_resh)
            return carry + jnp.sum(s.t1_points) * 1e-12, None
        out, _ = jax.lax.scan(body, jnp.asarray(0.0),
                              jax.random.split(key, args.scan))
        return out

    def timeit(fn, *a):
        out = fn(*a)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*a)
            float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2] / args.scan

    variants = {
        "sampler": lambda: timeit(sampler_only, params, data, key0),
        "of": lambda: timeit(make_step(True, False, False, False),
                             params, data, key0),
        "p1": lambda: timeit(make_step(True, True, False, False),
                             params, data, key0),
        "p1gen": lambda: timeit(make_step(True, True, True, False,
                                          cyc_gen_only=True),
                                params, data, key0),
        "p1cyc": lambda: timeit(make_step(True, True, True, False),
                                params, data, key0),
        "full": lambda: timeit(make_step(True, True, True, True),
                               params, data, key0),
    }
    results = {}
    for name in args.variants:
        results[f"{name}_ms"] = round(variants[name]() * 1e3, 2)
        print(f"[{name}] {results[f'{name}_ms']} ms/step", file=sys.stderr,
              flush=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()

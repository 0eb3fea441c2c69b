"""Component-level timing of the train step on the real device.

The production bench showed ~196 ms/iter at ~0.6% MFU — the step is not
MXU-bound. This script times each piece as its own jitted program to find
the wall-clock dominator: sampler, DeltaDINO refinement (fwd and grad),
correlation+head, each loss term, optimizer update.

    python scripts/perf_train_breakdown.py [--t 50] [--dtype float32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def fence(out):
    """Materialize ONE scalar on the host (block_until_ready is unreliable
    on the relay platform; np.asarray of a big leaf would time the ~10 MB/s
    host transfer instead of the computation)."""
    leaf = jax.tree.leaves(out)[0]
    return float(leaf.reshape(-1)[0])


def timed(fn, args, iters=5, name=""):
    out = fn(*args)
    fence(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    dt = (time.time() - t0) / iters
    print(json.dumps({"component": name, "ms": round(dt * 1e3, 2)}))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=50)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()

    import bench as bench_mod
    from dino_tracker_tpu.config import TrainConfig
    from dino_tracker_tpu.models import tracker
    from dino_tracker_tpu.models.tracker import TrackerConfig, TrackerInput
    from dino_tracker_tpu.training import contrastive, cycle, losses
    from dino_tracker_tpu.training import train as train_lib
    from dino_tracker_tpu.training.sampler import sample_batch

    tcfg = TrackerConfig(compute_dtype=args.dtype)
    cfg = TrainConfig()
    t = args.t
    data = bench_mod.synthetic_video_data_on_device(t, tcfg)
    state = train_lib.init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    key = jax.random.PRNGKey(1)

    # 1. sampler
    sampler = jax.jit(lambda k: sample_batch(
        k, data.fg_bank, data.bg_bank, cfg.train_batch_size,
        cfg.batch_n_frames, cfg.fg_traj_ratio, t, cfg.video_resw,
        cfg.video_resh))
    sample = timed(sampler, (key,), name="sample_batch")

    # 2. DeltaDINO refinement forward
    refine = jax.jit(lambda p, bs, v, d, fs: tracker.get_refined_embeddings(
        p, bs, v, d, fs, tcfg, train=True)[0])
    refined = timed(refine, (state.params, state.batch_stats, data.video,
                             data.dino_embed, sample.frames_set_t),
                    name="delta_dino_fwd")

    # 3. correlation + head forward
    inp = TrackerInput(sample.t1_points, sample.source_frame_indices,
                       sample.target_frame_indices, sample.frames_set_t)

    def corr_head(p, refined, inp):
        return tracker.get_point_predictions(p, inp, refined, tcfg)

    timed(jax.jit(corr_head), (state.params, refined, inp), name="corr_head_fwd")

    # 4. refinement grad (DeltaDINO fwd+bwd through a scalar reduction)
    def refine_loss(p, bs, v, d, fs):
        r, _, _, _ = tracker.get_refined_embeddings(p, bs, v, d, fs, tcfg,
                                                    train=True)
        return jnp.sum(r * r) * 1e-6

    timed(jax.jit(jax.grad(refine_loss)),
          (state.params, state.batch_stats, data.video, data.dino_embed,
           sample.frames_set_t), name="delta_dino_grad")

    # 5. tracking loss grad (refine + corr + head + huber, fwd+bwd)
    def of_loss(p, bs, v, d, sample):
        r, _, _, _ = tracker.get_refined_embeddings(
            p, bs, v, d, sample.frames_set_t, tcfg, train=True)
        inp = TrackerInput(sample.t1_points, sample.source_frame_indices,
                           sample.target_frame_indices, sample.frames_set_t)
        coords = tracker.get_point_predictions(p, inp, r, tcfg)
        return jnp.mean(losses.huber(coords, sample.t2_points_normalized[:, :2]))

    timed(jax.jit(jax.grad(of_loss)),
          (state.params, state.batch_stats, data.video, data.dino_embed,
           sample), name="of_loss_grad")

    # 6. cycle data generation + loss forward
    def cyc(p, refined, fs, fg, k):
        cd = cycle.generate_cycle_data(k, p, refined, fs, fg, tcfg,
                                       cfg.cyc_n_frames,
                                       cfg.cyc_batch_size_per_frame,
                                       cfg.cyc_fg_points_ratio, cfg.cyc_thresh)
        return cycle.cycle_consistency_loss(p, refined, fs, cd, tcfg,
                                            cfg.cyc_gamma)

    timed(jax.jit(cyc), (state.params, refined, sample.frames_set_t,
                         data.fg_masks, key), name="cycle_fwd_flat")

    # production path: blocked per-pair single-target correlations
    def cyc_grouped(p, refined, fs, fg, k):
        cd = cycle.generate_cycle_data(k, p, refined, fs, fg, tcfg,
                                       cfg.cyc_n_frames,
                                       cfg.cyc_batch_size_per_frame,
                                       cfg.cyc_fg_points_ratio, cfg.cyc_thresh)
        return cycle.cycle_consistency_loss(
            p, refined, fs, cd, tcfg, cfg.cyc_gamma,
            group_size=cfg.cyc_batch_size_per_frame)

    timed(jax.jit(cyc_grouped), (state.params, refined, sample.frames_set_t,
                                 data.fg_masks, key), name="cycle_fwd_grouped")

    # 7. contrastive losses forward
    def cl_dino(k, refined, fs):
        return contrastive.dino_bb_contrastive_loss(
            k, refined, fs, data.bb, data.fg_masks, tcfg, cfg.cl_n_frames,
            cfg.cl_points_per_pair, cfg.cl_fg_points_ratio, cfg.cl_temp,
            cfg.cl_div_dino_bb, cfg.bb_amb_sig_a, cfg.bb_amb_sig_b)

    timed(jax.jit(cl_dino), (key, refined, sample.frames_set_t),
          name="cl_dino_fwd")

    def cl_ref(k, refined, fs):
        return contrastive.refined_bb_contrastive_loss(
            k, refined, fs, data.fg_masks, tcfg, cfg.cl_n_frames,
            cfg.cl_points_per_pair, cfg.cl_fg_points_ratio, cfg.cl_temp,
            cfg.cl_div_ref_bb)

    timed(jax.jit(cl_ref), (key, refined, sample.frames_set_t),
          name="cl_ref_fwd")

    # 8. full step for reference
    step = train_lib.make_train_step(cfg, tcfg, use_cyc=True, use_cl_ref=True)
    timed(step, (state, data, key), name="full_step")


if __name__ == "__main__":
    main()

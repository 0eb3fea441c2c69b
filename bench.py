"""Benchmark: full-fidelity training step throughput on one chip.

Measures the PRODUCTION configuration of the phase-2 jitted train step
(tracking + cycle-consistency + both contrastive losses + regularizers,
backward, Adam) — i.e. exactly what training.Trainer dispatches:
``steps_per_call=25`` iterations fused into one program (config.py
TrainConfig.steps_per_call), at the reference's workload constants
(854×476 video, ViT-L 1024-dim stride-7 features, batch 512 points ×
4 frames — config/train.yaml:11-17) with a DAVIS-realistic 50 resident
frames. Also reports the unfused per-step dispatch time and an MFU
estimate from XLA's cost analysis.

vs_baseline: the reference trains 10k iters on an A100 at roughly 3 it/s
(~55 min/video; the repo publishes no speed numbers — BASELINE.md — so this
is our documented estimate for a 512-point batch with ~15 CUDA kernel
launches/iter). vs_baseline = baseline_minutes / ours_minutes (>1 ⇒ faster).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_MINUTES_10K = 55.0
# TPU v5e peak: 197 TFLOP/s bf16 per chip
PEAK_FLOPS = 197e12


def synthetic_video_data_on_device(t, tcfg, c=1024, bb_cap=512, n_traj=20000):
    """Like __graft_entry__._synthetic_video_data but the big tensors (video,
    feature video) are GENERATED on device — the axon relay moves host bytes
    at ~10 MB/s, so uploading a 1.7 GB synthetic feature video would dominate
    the benchmark setup."""
    from dino_tracker_tpu.structures import BBData
    from dino_tracker_tpu.training import sampler as sampler_lib
    from dino_tracker_tpu.training.train import VideoData

    h, w = tcfg.video_h, tcfg.video_w
    hp, wp = tcfg.feat_hw
    k = jax.random.PRNGKey(0)
    kv, kd, km, kb1, kb2, kc, kr = jax.random.split(k, 7)

    @jax.jit
    def big():
        video = jax.random.uniform(kv, (t, 3, h, w), jnp.float32)
        # f16: the production resident stack keeps the artifact dtype
        # (runtime.load_video_data); the step upcasts per gathered frame set
        dino = jax.random.normal(kd, (t, c, hp, wp), jnp.float32).astype(
            jnp.float16)
        fg = (jax.random.uniform(km, (t, h, w)) < 0.3).astype(jnp.float32)
        return video, dino, fg

    video, dino, fg_masks = big()

    rng = np.random.default_rng(0)
    traj = rng.random((n_traj, t, 2)).astype(np.float32) * [w - 1, h - 1]
    vis = rng.random((n_traj, t)) < 0.8
    traj[~vis] = np.nan
    fg_bank = sampler_lib.build_bank(traj)
    traj2 = rng.random((n_traj, t, 2)).astype(np.float32) * [w - 1, h - 1]
    bg_bank = sampler_lib.build_bank(traj2)

    @jax.jit
    def bb_arrays():
        sc = jax.random.uniform(kb1, (t, t, bb_cap, 2)) * jnp.asarray(
            [w - 1.0, h - 1.0])
        tc = jax.random.uniform(kb2, (t, t, bb_cap, 2)) * jnp.asarray(
            [w - 1.0, h - 1.0])
        cos = jax.random.uniform(kc, (t, t, bb_cap))
        r = jax.random.uniform(kr, (t, t, bb_cap))
        nvalid = 2 + (jax.random.uniform(kc, (t, t)) * (bb_cap - 2)).astype(
            jnp.int32)
        valid = jnp.arange(bb_cap)[None, None, :] < nvalid[..., None]
        return sc, tc, cos, r, valid

    sc, tc, cos, r, valid = bb_arrays()
    bb = BBData(source_coords=sc, target_coords=tc, cos_sims=cos, r=r,
                valid=valid)
    return VideoData(video, dino, fg_masks, bb, fg_bank, bg_bank)


def time_step(step, state, data, n_calls, iters_per_call):
    key = jax.random.PRNGKey(0)

    def sync(m):
        # materialize a scalar on the host — block_until_ready alone is not
        # a reliable fence on the axon remote-device platform
        return float(m["loss_total"])

    # warmup / compile (two calls: the first post-compile dispatch overlaps)
    for _ in range(2):
        key, sub = jax.random.split(key)
        state, metrics = step(state, data, sub)
        sync(metrics)

    t0 = time.time()
    for _ in range(n_calls):
        key, sub = jax.random.split(key)
        state, metrics = step(state, data, sub)
    sync(metrics)
    return (time.time() - t0) / (n_calls * iters_per_call)


def analytic_flops_per_iter(tcfg, n_frames: int = 8, batch: int = 512):
    """Analytic LOWER BOUND on per-iteration FLOPs: DeltaDINO conv stack
    (forward ×3 for fwd+bwd — the step's dominant term) + the point-vs-frame
    correlation einsum. Losses/head/sampler add a few hundred GF more."""
    h, w = tcfg.video_h, tcfg.video_w
    chans = tcfg.delta_channels
    k2 = 25  # 5×5 convs
    fwd = 0.0
    sh, sw = h, w
    for i, (cin, cout) in enumerate(zip(chans[:-1], chans[1:])):
        fwd += sh * sw * cout * cin * k2 * 2
        if i < 3:  # BlurPool after the first three layers
            sh, sw = sh // 2, sw // 2
    feat_hw = ((h - tcfg.dino_patch_size) // tcfg.stride + 1) * (
        (w - tcfg.dino_patch_size) // tcfg.stride + 1)
    corr = batch * chans[-1] * feat_hw * 2
    return 3.0 * fwd * n_frames + corr


def flops_per_step(step, state, data, tcfg, steps_per_call,
                   n_frames: int = 8, batch: int = 512):
    """XLA cost-analysis FLOPs for ONE fused program; falls back to the
    analytic bound when the remote-compile backend under-reports (observed:
    cost_analysis returns ~217 GF/iter where DeltaDINO alone is ~4 TF)."""
    analytic = analytic_flops_per_iter(
        tcfg, n_frames=n_frames, batch=batch) * steps_per_call
    try:
        key = jax.random.PRNGKey(0)
        compiled = step.lower(state, data, key).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        reported = float(ca.get("flops", 0.0))
    except Exception:
        reported = 0.0
    return max(reported, analytic)


def main():
    from dino_tracker_tpu.config import TrainConfig
    from dino_tracker_tpu.models.tracker import TrackerConfig
    from dino_tracker_tpu.training import train as train_lib

    t = 50  # DAVIS-realistic resident frame count
    cfg = TrainConfig()     # full reference hyper-parameters
    # production tracker config — exactly what DINOTrackerRuntime builds,
    # incl. the bf16 conv/matmul compute dtype (f32 accumulation)
    tcfg = TrackerConfig(video_h=cfg.video_resh, video_w=cfg.video_resw,
                         dino_patch_size=cfg.dino_patch_size, stride=cfg.stride,
                         delta_channels=(3, 64, 128, 256, cfg.dino_embed_dim),
                         compute_dtype=cfg.compute_dtype)
    data = synthetic_video_data_on_device(t, tcfg)
    state = train_lib.init_train_state(jax.random.PRNGKey(0), cfg, tcfg)

    # production path: the 25-iteration fused dispatch Trainer actually runs
    fused = train_lib.make_train_step(cfg, tcfg, use_cyc=True, use_cl_ref=True,
                                      steps_per_call=cfg.steps_per_call)
    dt_fused = time_step(fused, state, data, n_calls=4,
                         iters_per_call=cfg.steps_per_call)
    # diagnostic: unfused single-step dispatch (per-dispatch relay latency)
    single = train_lib.make_train_step(cfg, tcfg, use_cyc=True,
                                       use_cl_ref=True)
    dt_single = time_step(single, state, data, n_calls=10, iters_per_call=1)

    fl = flops_per_step(fused, state, data, tcfg, cfg.steps_per_call,
                        n_frames=2 * cfg.batch_n_frames,
                        batch=cfg.train_batch_size)
    mfu = (fl / cfg.steps_per_call / dt_fused / PEAK_FLOPS) if fl else None

    minutes_10k = dt_fused * 10_000 / 60.0
    print(json.dumps({
        "metric": "train_10k_iters_minutes",
        "value": round(minutes_10k, 2),
        "unit": "minutes_per_video",
        "vs_baseline": round(BASELINE_MINUTES_10K / minutes_10k, 3),
        "detail": {
            "t_frames": t,
            "steps_per_call": cfg.steps_per_call,
            "ms_per_iter_fused": round(dt_fused * 1e3, 2),
            "ms_per_iter_single_dispatch": round(dt_single * 1e3, 2),
            "mfu": round(mfu, 4) if mfu is not None else None,
        },
    }))


if __name__ == "__main__":
    main()

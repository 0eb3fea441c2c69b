"""Split the cycle loss's virtual-mesh replication between its two halves:
no-grad data generation (sampling + fwd/bwd grouped predictions) vs the
with-grad grouped re-prediction loss.

Usage: python scripts/perf_mesh_cycle_ablate.py
"""

import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def _time(fn, reps=3):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def build(mesh):
    import __graft_entry__ as ge
    from dino_tracker_tpu.config import TrainConfig
    from dino_tracker_tpu.models.tracker import TrackerConfig
    from dino_tracker_tpu.models import tracker
    from dino_tracker_tpu.training import train as train_lib
    from dino_tracker_tpu.training import cycle
    from dino_tracker_tpu.parallel.mesh import constrain_batch

    t, h, w, c = 8, 140, 196, 32
    tcfg = TrackerConfig(video_h=h, video_w=w, delta_channels=(3, 8, 8, 8, c))
    cfg = TrainConfig(train_batch_size=512, batch_n_frames=4,
                      cyc_n_frames=2, cyc_batch_size_per_frame=64,
                      cl_n_frames=2, cl_points_per_pair=64)
    data = ge._synthetic_video_data(t, h, w, c, bb_cap=16, n_traj=400,
                                    tcfg=tcfg)
    state = train_lib.init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    frames_set_t = jnp.arange(cfg.batch_n_frames * 2)

    @jax.jit
    def gen_only(params, stats, key):
        refined, _, _, _ = tracker.get_refined_embeddings(
            params, stats, data.video, data.dino_embed, frames_set_t, tcfg,
            train=True)
        refined = constrain_batch(refined, mesh)
        view = tracker.make_frame_view(refined, jnp.dtype(tcfg.compute_dtype))
        cd = cycle.generate_cycle_data(
            key, params, refined, frames_set_t, data.fg_masks, tcfg,
            cfg.cyc_n_frames, cfg.cyc_batch_size_per_frame,
            cfg.cyc_fg_points_ratio, cfg.cyc_thresh, view=view)
        return cd

    @jax.jit
    def loss_only(params, stats, cd):
        def f(p):
            refined, _, _, _ = tracker.get_refined_embeddings(
                p, stats, data.video, data.dino_embed, frames_set_t, tcfg,
                train=True)
            refined = constrain_batch(refined, mesh)
            view = tracker.make_frame_view(refined,
                                           jnp.dtype(tcfg.compute_dtype))
            return cycle.cycle_consistency_loss(
                p, refined, frames_set_t, cd, tcfg, cfg.cyc_gamma, view=view,
                group_size=cfg.cyc_batch_size_per_frame)
        return jax.grad(f)(params)

    key = jax.random.PRNGKey(1)
    with mesh:
        cd = jax.block_until_ready(gen_only(state.params, state.batch_stats,
                                            key))

    def run_gen():
        with mesh:
            out = gen_only(state.params, state.batch_stats, key)
        jax.block_until_ready(out)

    def run_loss():
        with mesh:
            out = loss_only(state.params, state.batch_stats, cd)
        jax.block_until_ready(out)

    return run_gen, run_loss


def main():
    from dino_tracker_tpu.parallel.mesh import make_mesh
    assert len(jax.devices()) >= 8

    for label, idx in [("gen (no-grad fwd/bwd + sampling)", 0),
                       ("loss (with-grad grouped repredict)", 1)]:
        t1 = _time(build(make_mesh(1))[idx])
        t8 = _time(build(make_mesh(8))[idx])
        print(f"{label:36s}  mesh1={t1:7.3f}s  mesh8={t8:7.3f}s  "
              f"ratio={t8 / t1:5.2f}", flush=True)


if __name__ == "__main__":
    main()

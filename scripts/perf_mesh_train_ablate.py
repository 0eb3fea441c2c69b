"""Attribute the train step's virtual-mesh scaling gap (E2E_r04: ratio 1.94).

Runs the fused train step on the 8-virtual-CPU-device mesh vs mesh=1 with
loss components ablated (static phase flags), so the component whose
compute replicates across the mesh shows up as the ratio driver.

Usage: python scripts/perf_mesh_train_ablate.py
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


def run_variant(mesh, use_cyc, use_cl_ref):
    import __graft_entry__ as ge
    from dino_tracker_tpu.config import TrainConfig
    from dino_tracker_tpu.models.tracker import TrackerConfig
    from dino_tracker_tpu.training import train as train_lib

    t, h, w, c = 8, 140, 196, 32
    tcfg = TrackerConfig(video_h=h, video_w=w, delta_channels=(3, 8, 8, 8, c))
    cfg = TrainConfig(train_batch_size=512, batch_n_frames=4,
                      cyc_n_frames=2, cyc_batch_size_per_frame=64,
                      cl_n_frames=2, cl_points_per_pair=64)
    data = ge._synthetic_video_data(t, h, w, c, bb_cap=16, n_traj=400,
                                    tcfg=tcfg)
    state = train_lib.init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = train_lib.make_train_step(cfg, tcfg, use_cyc=use_cyc,
                                     use_cl_ref=use_cl_ref, mesh=mesh)
    key = jax.random.PRNGKey(1)

    def run():
        with mesh:
            new_state, _ = step(state, data, key)
        jax.block_until_ready(new_state.params)
    return _time(run)


def main():
    from dino_tracker_tpu.parallel.mesh import make_mesh
    assert len(jax.devices()) >= 8

    for use_cyc, use_cl_ref, label in [
            (False, False, "of+dino_cl only"),
            (True, False, "+cycle"),
            (False, True, "+refined_cl"),
            (True, True, "full (phase 2)")]:
        t1 = run_variant(make_mesh(1), use_cyc, use_cl_ref)
        t8 = run_variant(make_mesh(8), use_cyc, use_cl_ref)
        print(f"{label:18s}  mesh1={t1:7.3f}s  mesh8={t8:7.3f}s  "
              f"ratio={t8 / t1:5.2f}", flush=True)


if __name__ == "__main__":
    main()

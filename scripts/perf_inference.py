"""Real-scale inference wall clock: N query points × T frames, full
trajectory + anchor + occlusion path (the per-video benchmark inference)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from dino_tracker_tpu.models import tracker
from dino_tracker_tpu.models.tracker import TrackerConfig
from dino_tracker_tpu.inference.infer import ModelInference

T, N = 50, 26  # DAVIS-scale video length and per-query-frame point count
tcfg = TrackerConfig()
rng = np.random.default_rng(0)
hp, wp = tcfg.feat_hw
params, _ = tracker.init_tracker(jax.random.PRNGKey(0), tcfg)
refined = jnp.asarray(rng.standard_normal((T, 1024, hp, wp)).astype(np.float32))

mi = ModelInference(params=params, refined_features=refined, cfg=tcfg,
                    anchor_cosine_similarity_threshold=0.7,
                    cosine_similarity_threshold=0.6)
print(f"auto chunk: {mi.chunk}", flush=True)
q = np.stack([rng.random(N) * 853, rng.random(N) * 475,
              rng.integers(0, T, N)], -1).astype(np.float32)
t0 = time.time()
trajs, occ = mi.infer(q)
print(f"infer (compile+run): {time.time()-t0:.1f}s "
      f"trajs {trajs.shape} occ_rate {occ.mean():.2f}", flush=True)
t0 = time.time()
trajs, occ = mi.infer(q)
print(f"infer steady: {time.time()-t0:.1f}s for {N} queries × {T} frames "
      f"(incl. {N*T*T} anchor re-predictions)", flush=True)

# r2 flat path (one full-T contraction per (source, target) pair) for the
# back-to-back comparison against the multi-target kernel
src = jnp.repeat(jnp.asarray(q), T, axis=0)
sf = src[:, 2].astype(jnp.int32)
tf = jnp.tile(jnp.arange(T, dtype=jnp.int32), N)
mi._predict_chunked(src, sf, tf).block_until_ready()  # compile
t0 = time.time()
mi._predict_chunked(src, sf, tf).block_until_ready()
flat_traj = time.time() - t0
tgt = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (N, T))
mi._predict_multi_chunked(jnp.asarray(q), jnp.asarray(q)[:, 2].astype(jnp.int32),
                          tgt).block_until_ready()
t0 = time.time()
mi._predict_multi_chunked(jnp.asarray(q), jnp.asarray(q)[:, 2].astype(jnp.int32),
                          tgt).block_until_ready()
print(f"trajectories ({N*T} preds): flat {flat_traj:.2f}s vs multi "
      f"{time.time()-t0:.2f}s", flush=True)

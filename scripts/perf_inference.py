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

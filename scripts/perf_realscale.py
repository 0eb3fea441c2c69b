"""Real-scale component throughput: ViT-L stride-7 extraction (854×476,
8108 tokens) and the 8107² best-buddy pair sweep. Run on the TPU:

    python scripts/perf_realscale.py <dino_checkpoint.npz>
"""
import time
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp

from dino_tracker_tpu.models.vit import extract_feature_video
from dino_tracker_tpu.models.vit_convert import load_dinov2_checkpoint
from dino_tracker_tpu.preprocessing.best_buddies import _mutual_nn_pair
from dino_tracker_tpu.utils.coords import bb_meshgrid


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_drive/dinov2_vitl14_random.npz"
    params, cfg = load_dinov2_checkpoint(ckpt, "dinov2_vitl14")
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.random((4, 3, 476, 854), dtype=np.float32))
    t0 = time.time()
    f = extract_feature_video(params, video, cfg, stride=7, layer=15,
                              frames_per_batch=2)
    f = np.asarray(f)
    print(f"extract 4 frames (compile+transfer+run): {time.time()-t0:.1f}s "
          f"{f.shape}", flush=True)
    t0 = time.time()
    f2 = extract_feature_video(params, video, cfg, stride=7, layer=15,
                               frames_per_batch=2)
    _ = np.asarray(f2[0, 0, 0, 0])
    dt = time.time() - t0
    print(f"extract steady: {dt/4*1000:.0f} ms/frame ({4/dt:.2f} frames/s)",
          flush=True)

    feats = jnp.asarray(f)
    grid = bb_meshgrid(476, 854, 7)
    flat = feats.reshape(4, 1024, -1).transpose(0, 2, 1)
    r = _mutual_nn_pair(flat[0], flat[1], grid, 1024)
    _ = np.asarray(r[0])
    t0 = time.time()
    for i in range(3):
        r = _mutual_nn_pair(flat[i % 4], flat[(i + 1) % 4], grid, 1024)
    _ = np.asarray(r[0])
    dt = (time.time() - t0) / 3
    print(f"bb pair (8107² affinity): {dt*1000:.0f} ms/pair -> "
          f"T=50 sweep {dt*1225/60:.1f} min", flush=True)


if __name__ == "__main__":
    main()

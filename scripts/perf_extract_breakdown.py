"""Attribute the preprocess/dino_features stage: device compute vs host
transfer vs artifact save, at the production shape (854×476, stride 7,
ViT-L, two layers in one sweep). Run on the TPU:

    python scripts/perf_extract_breakdown.py [dino_checkpoint.npz]

The E2E stage timer (preprocess/dino_features in scripts/perf_e2e.py) is the
sum of these; this script says which knob to turn next (bigger frame batch /
f16 store / async save are already in config.py).
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from dino_tracker_tpu.models.vit import extract_feature_video
from dino_tracker_tpu.models.vit_convert import load_dinov2_checkpoint


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", nargs="?",
                    default="/tmp/verify_drive/dinov2_vitl14_random.npz")
    ap.add_argument("--model", default="dinov2_vitl14")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--res", type=int, nargs=2, default=(476, 854))
    ap.add_argument("--layers", type=int, nargs=2, default=(15, 23))
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke mode)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    params, cfg = load_dinov2_checkpoint(args.ckpt, args.model)
    rng = np.random.default_rng(0)
    n = args.frames
    h, w = args.res
    video = jnp.asarray(rng.random((n, 3, h, w), dtype=np.float32))

    report = {}
    # compile + first run
    t0 = time.time()
    f = extract_feature_video(params, video, cfg, stride=7, layer=list(args.layers),
                              frames_per_batch=4,
                              compute_dtype=jnp.bfloat16)[0]
    float(jnp.sum(f[0, 0, 0, :8]))  # device fence (tiny fetch)
    report["compile_plus_first_s"] = round(time.time() - t0, 1)

    # device compute only (fence via scalar, no bulk fetch)
    t0 = time.time()
    f = extract_feature_video(params, video, cfg, stride=7, layer=list(args.layers),
                              frames_per_batch=4,
                              compute_dtype=jnp.bfloat16)[0]
    float(jnp.sum(f[0, 0, 0, :8]))
    dt = time.time() - t0
    report["compute_ms_per_frame"] = round(dt / n * 1000, 1)

    # host transfer: full fetch at f32 and f16
    t0 = time.time()
    _ = np.asarray(f)
    dt = time.time() - t0
    report["fetch_f32_ms_per_frame"] = round(dt / n * 1000, 1)
    f16 = f.astype(jnp.float16)
    float(jnp.sum(f16[0, 0, 0, :8]))
    t0 = time.time()
    host16 = np.asarray(f16)
    dt = time.time() - t0
    report["fetch_f16_ms_per_frame"] = round(dt / n * 1000, 1)

    # artifact save (what async_artifact_save overlaps)
    t0 = time.time()
    np.savez("/tmp/extract_breakdown_feats.npz", f=host16)
    report["save_f16_ms_per_frame"] = round((time.time() - t0) / n * 1000, 1)
    os.remove("/tmp/extract_breakdown_feats.npz")

    report["t50_projection_s"] = round(
        50 * (report["compute_ms_per_frame"]
              + report["fetch_f16_ms_per_frame"]) / 1000, 1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()

"""One-command accuracy-parity harness, gated on weights.

The reference's validation story is reproducing AJ 0.6528 / δ 0.8066 /
OA 0.8854 on TAP-Vid-DAVIS (reference README.md:164-166). No pretrained
weights exist in this environment, so this script makes the comparison a
single invocation the moment they are mountable:

  python scripts/parity_harness.py --data-path <video_dir> \
      --dino-checkpoint dinov2_vitl14.{pth,npz} \
      --raft-checkpoint raft-things.pth \
      [--torch-features dino_features_torch.npz]   # feature parity gate
      [--torch-flows raft_flows_torch.npz]         # flow parity gate
      [--run-e2e --train-config config/train.yaml
       --preprocess-config config/preprocessing.yaml
       --benchmark-pickle-path tapvid_davis.pkl --video-id N]

Stages (each skipped unless its inputs are given):
  1. feature parity: our JAX ViT features vs a dumped torch feature video,
     per-token cosine similarity — PASS at min cos ≥ 0.999 (SURVEY §7
     step 2; reference utils.py:33-72 get_dino_features_video).
  2. flow parity: our RAFT adjacent flows vs dumped torchvision flows,
     mean end-point error — PASS at EPE ≤ 0.5 px (reference
     extract_trajectories.py:61-95).
  3. end-to-end: preprocess → 10k-iter train → benchmark inference → eval
     CSV (the AJ/δ/OA numbers to compare against README.md:164-166).

Torch-side dump commands (run them wherever the reference env lives):

  # features — after the reference's save_dino_embed_video step:
  python -c "import torch, numpy as np; \
    x = torch.load('<data>/dino_embeddings/dino_embed_video.pt', \
                   map_location='cpu').numpy(); \
    np.savez('dino_features_torch.npz', features=x)"

  # adjacent RAFT flows (t -> t+1), torchvision raft_large @ 24 iters:
  python - <<'PY'
  import numpy as np, torch
  from torchvision.models.optical_flow import raft_large, Raft_Large_Weights
  from data.data_utils import load_video, InputPadder  # reference repo root
  video = load_video('<data>/video', resize_height=476, resize_width=854)
  model = raft_large(weights=Raft_Large_Weights.C_T_SKHT_V2).cuda().eval()
  padder = InputPadder(video.shape[-2:])
  v = padder.pad(video.cuda())
  flows = []
  with torch.no_grad():
      for i in range(len(v) - 1):
          f = model(v[i:i+1] * 2 - 1, v[i+1:i+2] * 2 - 1, num_flow_updates=24)
          flows.append(padder.unpad(f[-1]).cpu().numpy()[0])
  np.savez('raft_flows_torch.npz', flows=np.stack(flows))
  PY
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def feature_parity(video, vit_params, vit_cfg, cfg, torch_features_path,
                   min_cos: float) -> dict:
    import jax.numpy as jnp
    import numpy as np
    from dino_tracker_tpu.models.vit import extract_feature_video

    with np.load(torch_features_path) as f:
        ref = f["features"]  # T×C×h'×w'
    ours = np.asarray(extract_feature_video(
        vit_params, jnp.asarray(video[: ref.shape[0]]), vit_cfg,
        stride=cfg.dino_stride, layer=cfg.dino_layer, facet=cfg.dino_facet,
        frames_per_batch=cfg.extract_frames_per_batch))
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    a = ours.reshape(ours.shape[0], ours.shape[1], -1)
    b = ref.reshape(*a.shape)
    cos = (a * b).sum(1) / np.clip(
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1), 1e-8, None)
    return {"stage": "feature_parity", "min_cos": float(cos.min()),
            "mean_cos": float(cos.mean()),
            "pass": bool(cos.min() >= min_cos), "threshold": min_cos}


def flow_parity(video, raft_params, cfg, torch_flows_path,
                max_epe: float) -> dict:
    import jax.numpy as jnp
    import numpy as np
    from dino_tracker_tpu.preprocessing.flow import RaftFlowEngine

    with np.load(torch_flows_path) as f:
        ref = f["flows"]  # (T-1)×2×H×W
    # runs at the configured raft_compute_dtype: setting bfloat16 in the
    # preprocessing yaml turns this gate into the bf16-vs-torch EPE check
    eng = RaftFlowEngine(raft_params, video[: ref.shape[0] + 1],
                         num_iters=cfg.raft_iters,
                         compute_dtype=jnp.dtype(cfg.raft_compute_dtype))
    fwd, _ = eng.adjacent_flows()
    epe = np.linalg.norm(fwd - ref, axis=1)  # (T-1)×H×W
    return {"stage": "flow_parity", "mean_epe": float(epe.mean()),
            "p95_epe": float(np.percentile(epe, 95)),
            "pass": bool(epe.mean() <= max_epe), "threshold": max_epe}


def run_e2e(args, raft_params, vit_params, vit_cfg) -> dict:
    """preprocess → train → benchmark inference → eval CSV."""
    from dino_tracker_tpu.config import PreprocessConfig, TrainConfig
    from dino_tracker_tpu.preprocessing.pipeline import PreprocessingPipeline
    from dino_tracker_tpu.runtime import DINOTrackerRuntime

    pcfg = PreprocessConfig.from_yaml(args.preprocess_config)
    PreprocessingPipeline(args.data_path, pcfg, raft_params=raft_params,
                          vit_params=vit_params, vit_cfg=vit_cfg).run()
    tcfg = TrainConfig.from_yaml(args.train_config)
    rt = DINOTrackerRuntime(args.data_path, tcfg, seed=args.seed)
    rt.train()
    out = {"stage": "e2e", "trained": True}
    if args.benchmark_pickle_path:
        rt.infer_benchmark(args.benchmark_pickle_path,
                           video_id=args.video_id)
        import pandas as pd
        from dino_tracker_tpu.evaluation import metrics as M
        from dino_tracker_tpu.evaluation.tapvid import load_benchmark
        bench = load_benchmark(args.benchmark_pickle_path)
        m = M.compute_tapvid_metrics_for_video(
            os.path.join(args.data_path, "trajectories"),
            os.path.join(args.data_path, "occlusions"),
            bench, args.video_id,
            pred_video_sizes=[tcfg.video_resw, tcfg.video_resh])
        csv = os.path.join(args.data_path, "parity_metrics.csv")
        pd.DataFrame([m]).to_csv(csv, index=False)
        out.update({"metrics": {k: float(v) for k, v in m.items()},
                    "csv": csv,
                    "reference_targets": {"average_jaccard": 0.6528,
                                          "average_pts_within_thresh": 0.8066,
                                          "occlusion_accuracy": 0.8854}})
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-path", required=True)
    ap.add_argument("--dino-checkpoint", required=True)
    ap.add_argument("--raft-checkpoint", default=None)
    ap.add_argument("--torch-features", default=None)
    ap.add_argument("--torch-flows", default=None)
    ap.add_argument("--min-cos", type=float, default=0.999)
    ap.add_argument("--max-epe", type=float, default=0.5)
    ap.add_argument("--run-e2e", action="store_true")
    ap.add_argument("--preprocess-config", default="./config/preprocessing.yaml")
    ap.add_argument("--train-config", default="./config/train.yaml")
    ap.add_argument("--benchmark-pickle-path", default=None)
    ap.add_argument("--video-id", type=int, default=0)
    ap.add_argument("--seed", type=int, default=2)
    args = ap.parse_args()

    import logging
    logging.basicConfig(level=logging.INFO)

    from dino_tracker_tpu.config import PreprocessConfig
    from dino_tracker_tpu.models.vit_convert import load_dinov2_checkpoint
    from dino_tracker_tpu.utils import video_io

    pcfg = PreprocessConfig.from_yaml(args.preprocess_config)
    vit_params, vit_cfg = load_dinov2_checkpoint(args.dino_checkpoint,
                                                 pcfg.dino_model_name)
    raft_params = None
    if args.raft_checkpoint:
        import torch
        from dino_tracker_tpu.models.raft import convert_raft_state_dict
        sd = torch.load(args.raft_checkpoint, map_location="cpu",
                        weights_only=True)
        raft_params = convert_raft_state_dict(sd)

    video = video_io.load_video(os.path.join(args.data_path, "video"),
                                resize=(pcfg.video_resh, pcfg.video_resw),
                                num_frames=pcfg.max_frames)

    results = []
    if args.torch_features:
        results.append(feature_parity(video, vit_params, vit_cfg, pcfg,
                                      args.torch_features, args.min_cos))
    if args.torch_flows:
        assert raft_params is not None, "--raft-checkpoint required"
        results.append(flow_parity(video, raft_params, pcfg,
                                   args.torch_flows, args.max_epe))
    if args.run_e2e:
        assert raft_params is not None, "--raft-checkpoint required"
        results.append(run_e2e(args, raft_params, vit_params, vit_cfg))

    for r in results:
        print(json.dumps(r))
    failed = [r for r in results if r.get("pass") is False]
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()

"""Preprocessing CLI (reference preprocessing/main_preprocessing.py).

Runs every stage in-process:
    python -m dino_tracker_tpu.cli.preprocess --data-path <video_dir> \
        --config config/preprocessing.yaml \
        --raft-checkpoint raft-things.pth --dino-checkpoint dinov2_vitl14.pth
"""

import argparse
import logging


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="./config/preprocessing.yaml")
    parser.add_argument("--data-path", required=True)
    parser.add_argument("--raft-checkpoint", default=None,
                        help="princeton-vl RAFT checkpoint (raft-things.pth)")
    parser.add_argument("--dino-checkpoint", default=None,
                        help="DINOv2 state-dict checkpoint (.pth/.npz)")
    parser.add_argument("--devices", type=int, default=0,
                        help="shard work over the first N devices "
                             "(jax.sharding.Mesh); 0 = single device")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    from ..config import PreprocessConfig
    from ..preprocessing.pipeline import PreprocessingPipeline

    cfg = PreprocessConfig.from_yaml(args.config)

    raft_params = None
    if args.raft_checkpoint:
        import torch
        from ..models.raft import convert_raft_state_dict
        sd = torch.load(args.raft_checkpoint, map_location="cpu",
                        weights_only=True)
        raft_params = convert_raft_state_dict(sd)

    vit_params, vit_cfg = None, None
    if args.dino_checkpoint:
        from ..models.vit_convert import load_dinov2_checkpoint
        vit_params, vit_cfg = load_dinov2_checkpoint(args.dino_checkpoint,
                                                     cfg.dino_model_name)

    mesh = None
    if args.devices:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh(args.devices)

    PreprocessingPipeline(args.data_path, cfg, raft_params=raft_params,
                          vit_params=vit_params, vit_cfg=vit_cfg,
                          mesh=mesh).run()


if __name__ == "__main__":
    main()

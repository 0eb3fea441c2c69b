"""Per-video test-time training CLI (reference train.py)."""

import argparse
import logging


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="./config/train.yaml")
    parser.add_argument("--data-path", required=True)
    parser.add_argument("--seed", default=2, type=int)
    parser.add_argument("--devices", type=int, default=0,
                        help="shard work over the first N devices (jax.sharding.Mesh); 0 = single device")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    from ..config import TrainConfig
    from ..runtime import DINOTrackerRuntime
    from ..utils.seeding import fix_random_seeds

    fix_random_seeds(args.seed)
    cfg = TrainConfig.from_yaml(args.config)
    DINOTrackerRuntime(args.data_path, cfg, seed=args.seed,
                       mesh_devices=args.devices).train()


if __name__ == "__main__":
    main()

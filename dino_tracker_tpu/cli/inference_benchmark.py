"""TAP-Vid benchmark inference CLI (reference inference_benchmark.py)."""

import argparse
import logging


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="./config/train.yaml")
    parser.add_argument("--data-path", required=True)
    parser.add_argument("--benchmark-pickle-path", required=True)
    parser.add_argument("--video-id", type=int, default=0)
    parser.add_argument("--iter", type=int, default=None,
                        help="checkpoint iteration (default: latest)")
    parser.add_argument("--batch-size", type=int, default=4096)
    parser.add_argument("--devices", type=int, default=0,
                        help="shard work over the first N devices (jax.sharding.Mesh); 0 = single device")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    from ..config import TrainConfig
    from ..runtime import DINOTrackerRuntime

    cfg = TrainConfig.from_yaml(args.config)
    rt = DINOTrackerRuntime(args.data_path, cfg,
                            mesh_devices=args.devices)
    rt.infer_benchmark(args.benchmark_pickle_path, args.video_id,
                       step=args.iter, chunk=args.batch_size)


if __name__ == "__main__":
    main()

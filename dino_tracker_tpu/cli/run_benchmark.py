"""Whole-benchmark fan-out CLI: preprocess→train→inference for every video
directory under a dataset root (multi-host work queue via --claim-dir)."""

import argparse
import logging


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset-root-dir", required=True,
                        help="one subdir per video id, each with video/")
    parser.add_argument("--benchmark-pickle-path", required=True)
    parser.add_argument("--train-config", default="./config/train.yaml")
    parser.add_argument("--preprocess-config",
                        default="./config/preprocessing.yaml")
    parser.add_argument("--raft-checkpoint", default=None)
    parser.add_argument("--dino-checkpoint", default=None)
    parser.add_argument("--stages", nargs="+",
                        default=["preprocess", "train", "inference"])
    parser.add_argument("--claim-dir", default=None,
                        help="shared dir for multi-host work claims")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    from ..parallel.launcher import BenchmarkLauncher

    BenchmarkLauncher(
        dataset_root=args.dataset_root_dir,
        benchmark_pickle_path=args.benchmark_pickle_path,
        train_config_path=args.train_config,
        preprocess_config_path=args.preprocess_config,
        raft_checkpoint=args.raft_checkpoint,
        dino_checkpoint=args.dino_checkpoint,
        stages=tuple(args.stages),
    ).run(claim_dir=args.claim_dir)


if __name__ == "__main__":
    main()

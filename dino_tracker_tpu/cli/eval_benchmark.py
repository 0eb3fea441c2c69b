"""Dataset evaluation CLI (reference eval/eval_benchmark.py): walks a root of
per-video prediction dirs, emits a per-video metrics CSV + mean row."""

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset-root-dir", required=True)
    parser.add_argument("--benchmark-pickle-path", required=True)
    parser.add_argument("--out-file", default="./comp_metrics.csv")
    parser.add_argument("--dataset-type", default="tapvid",
                        choices=["tapvid", "BADJA"])
    parser.add_argument("--pred-w", type=int, default=854)
    parser.add_argument("--pred-h", type=int, default=476)
    args = parser.parse_args()

    import pandas as pd
    from ..evaluation import metrics as M
    from ..evaluation.tapvid import load_benchmark

    benchmark_data = load_benchmark(args.benchmark_pickle_path)
    rows = []
    for name in sorted(os.listdir(args.dataset_root_dir)):
        if name.startswith("."):
            continue
        video_dir = os.path.join(args.dataset_root_dir, name)
        if not os.path.isdir(video_dir):
            continue
        video_idx = int(name)
        if args.dataset_type == "tapvid":
            m = M.compute_tapvid_metrics_for_video(
                os.path.join(video_dir, "trajectories"),
                os.path.join(video_dir, "occlusions"),
                benchmark_data, video_idx,
                pred_video_sizes=[args.pred_w, args.pred_h])
        else:
            m = M.compute_badja_metrics_for_video(
                os.path.join(video_dir, "trajectories"),
                benchmark_data, video_idx,
                pred_video_sizes=[args.pred_w, args.pred_h])
        m["video_idx"] = video_idx
        rows.append(m)

    df = pd.DataFrame(rows).set_index("video_idx")
    df.loc["average", :] = df.mean()
    df.to_csv(args.out_file)
    print("Total metrics:")
    print(df.mean())


if __name__ == "__main__":
    main()

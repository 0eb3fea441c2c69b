"""mp4 → frame folder (reference preprocessing/mp4_to_frames.py)."""

import argparse

from ..utils.video_io import mp4_to_frames


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--video-path", required=True)
    parser.add_argument("--output-folder", required=True)
    args = parser.parse_args()
    mp4_to_frames(args.video_path, args.output_folder)


if __name__ == "__main__":
    main()

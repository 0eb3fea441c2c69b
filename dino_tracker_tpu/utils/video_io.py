"""Video / image IO: frame folders <-> float arrays.

Host-side (NumPy/PIL/imageio); arrays are fed to the TPU as whole videos.
Reference behaviors: data/data_utils.py:79-104 ``load_video`` (sorted
jpg/png, LANCZOS resize, [0,1] floats, T×3×H×W), :107-117 ``save_video``,
preprocessing/split_trajectories_to_fg_bg.py:38-52 ``load_masks``
(grayscale + nearest resize).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Tuple

import numpy as np
from PIL import Image


def list_frame_files(folder: str):
    p = Path(folder)
    return sorted(list(p.glob("*.jpg")) + list(p.glob("*.png")))


def load_video(video_folder: str, resize: Optional[Tuple[int, int]] = None,
               num_frames: Optional[int] = None) -> np.ndarray:
    """Load a frame folder -> float32 T×3×H×W in [0, 1] (LANCZOS resize).

    Uses the native multithreaded decoder (native/video_io.cpp) when built —
    PIL fallback otherwise, or with DINO_TRACKER_NATIVE_IO=0. The native path
    resamples with PIL's Lanczos-3 kernel in float (PIL quantizes weights to
    8 bits, so outputs agree to ~1/255).
    """
    files = list_frame_files(video_folder)
    if num_frames is not None:
        files = files[:num_frames]

    if resize is not None and os.environ.get("DINO_TRACKER_NATIVE_IO", "1") != "0":
        from . import native_io
        out = native_io.decode_resize_batch(files, resize[0], resize[1])
        if out is not None:
            return out

    frames = []
    for f in files:
        img = Image.open(str(f)).convert("RGB")
        if resize is not None:
            resh, resw = resize
            img = img.resize((resw, resh), Image.LANCZOS)
        arr = np.asarray(img, dtype=np.float32) / 255.0  # H×W×3
        frames.append(np.transpose(arr, (2, 0, 1)))
    return np.stack(frames)


def get_original_video_res(video_folder: str) -> Tuple[int, int, int]:
    """(H, W, T) of the raw frame folder (reference dino_tracker.py:55-61)."""
    files = list_frame_files(video_folder)
    with Image.open(files[0]) as img:
        w, h = img.size
    return h, w, len(files)


def load_masks(masks_path: str, h_resize: Optional[int] = 476,
               w_resize: Optional[int] = 854) -> np.ndarray:
    """Grayscale masks, nearest-resized -> float32 T×H×W."""
    files = list_frame_files(masks_path)
    masks = []
    for f in files:
        m = np.asarray(Image.open(str(f)).convert("L"), dtype=np.float32)
        masks.append(m)
    masks = np.stack(masks)
    th = masks.shape[1] if h_resize is None else h_resize
    tw = masks.shape[2] if w_resize is None else w_resize
    if (th, tw) != masks.shape[1:]:
        # nearest-neighbor resize matching torch F.interpolate(mode="nearest"):
        # src index = floor(dst * src_size / dst_size)
        ys = np.floor(np.arange(th) * masks.shape[1] / th).astype(np.int64)
        xs = np.floor(np.arange(tw) * masks.shape[2] / tw).astype(np.int64)
        masks = masks[:, ys][:, :, xs]
    return masks


def save_video(video_thwc: np.ndarray, output_path: str, fps: int = 30):
    """Save a T×H×W×3 uint8 (RGB) video as mp4 (OpenCV writer — no external
    plugin dependencies)."""
    import cv2
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    t, h, w = video_thwc.shape[:3]
    writer = cv2.VideoWriter(output_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    try:
        for frame in video_thwc:
            writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    finally:
        writer.release()


def save_video_frames(video: np.ndarray, folder: str):
    """Save T×H×W[×C] uint8 frames as jpgs; returns the folder path."""
    import imageio
    path = Path(folder)
    path.mkdir(exist_ok=True, parents=True)
    for idx, frame in enumerate(video):
        imageio.imwrite(path / f"{idx:05d}.jpg", np.squeeze(frame))
    return path


def mp4_to_frames(mp4_file: str, output_folder: str):
    import imageio
    os.makedirs(output_folder, exist_ok=True)
    vid = imageio.get_reader(mp4_file)
    for i, frame in enumerate(vid):
        imageio.imwrite(os.path.join(output_folder, f"{i:05d}.jpg"), frame)


def get_grid_query_points(res_h_w: Tuple[int, int], segm_mask: Optional[np.ndarray] = None,
                          interval: int = 10, query_frame: int = 0) -> np.ndarray:
    """Every-``interval``-pixel grid of (x, y, t) query points on one frame,
    optionally filtered by a segmentation mask (reference
    data/data_utils.py:167-197)."""
    h, w = res_h_w
    gy = np.arange(0, h, interval)
    gx = np.arange(0, w, interval)
    gyy, gxx = np.meshgrid(gy, gx, indexing="ij")
    pts = np.stack([gxx.reshape(-1), gyy.reshape(-1)], axis=-1).astype(np.float32)
    if segm_mask is not None:
        if segm_mask.shape != (h, w):
            ys = np.floor(np.arange(h) * segm_mask.shape[0] / h).astype(np.int64)
            xs = np.floor(np.arange(w) * segm_mask.shape[1] / w).astype(np.int64)
            segm_mask = segm_mask[ys][:, xs]
        keep = segm_mask[np.round(pts[:, 1]).astype(np.int64),
                         np.round(pts[:, 0]).astype(np.int64)] > 0
        pts = pts[keep]
    t = np.full((pts.shape[0], 1), float(query_frame), dtype=np.float32)
    return np.concatenate([pts, t], axis=1)


def resize_flow(flow_n2hw: np.ndarray, newh: int, neww: int) -> np.ndarray:
    """Bilinear-resize a flow field and rescale its vectors (reference
    data/data_utils.py:158-164, cv2.INTER_LINEAR)."""
    import cv2
    out = []
    oldh, oldw = flow_n2hw.shape[-2:]
    for f in flow_n2hw:
        r = cv2.resize(np.transpose(f, (1, 2, 0)), (neww, newh),
                       interpolation=cv2.INTER_LINEAR)
        r[..., 0] *= neww / oldw
        r[..., 1] *= newh / oldh
        out.append(np.transpose(r, (2, 0, 1)))
    return np.stack(out)


def save_npz(path: str, **arrays):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **arrays)


def npz_array_header(path: str, name: str):
    """(shape, dtype) of one array inside an .npz WITHOUT decompressing its
    data — reads just the .npy header bytes. Used by the inference prewarm
    to learn a video's feature shapes before any heavy load."""
    import zipfile

    from numpy.lib import format as npf

    with zipfile.ZipFile(path) as zf:
        with zf.open(name + ".npy") as f:
            version = npf.read_magic(f)
            shape, _, dtype = npf._read_array_header(f, version)
    return shape, dtype


def load_npz(path: str) -> dict:
    with np.load(path, allow_pickle=False) as f:
        return {k: f[k] for k in f.files}

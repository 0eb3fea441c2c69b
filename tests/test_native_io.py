"""Native frame loader: build, decode, PIL-parity within quantization
tolerance, and speed sanity."""

import os
import time

import numpy as np
import pytest
from PIL import Image

from dino_tracker_tpu.utils import native_io, video_io

RNG = np.random.default_rng(31)


@pytest.fixture(scope="module")
def frames_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("frames")
    base = (RNG.random((120, 160, 3)) * 255).astype(np.uint8)
    for i in range(6):
        img = np.roll(base, i * 3, axis=1)
        Image.fromarray(img).save(d / f"{i:05d}.jpg", quality=95)
        Image.fromarray(img).save(d / f"p{i:05d}.png")
    return str(d)


def test_native_lib_builds():
    lib = native_io.get_lib()
    assert lib is not None, "native video_io failed to build"


def test_native_matches_pil_within_quantization(frames_dir):
    files = video_io.list_frame_files(frames_dir)
    out_h, out_w = 70, 98
    native = native_io.decode_resize_batch(files, out_h, out_w)
    assert native is not None
    assert native.shape == (len(files), 3, out_h, out_w)

    for i, f in enumerate(files):
        img = Image.open(str(f)).convert("RGB").resize((out_w, out_h),
                                                       Image.LANCZOS)
        ref = np.transpose(np.asarray(img, np.float32) / 255.0, (2, 0, 1))
        diff = np.abs(native[i] - ref)
        # PIL quantizes Lanczos weights to 8 bits; float vs fixed point
        assert diff.max() < 0.02, (str(f), diff.max())
        assert diff.mean() < 0.004


def test_load_video_native_and_pil_paths_agree(frames_dir):
    os.environ["DINO_TRACKER_NATIVE_IO"] = "1"
    a = video_io.load_video(frames_dir, resize=(70, 98))
    os.environ["DINO_TRACKER_NATIVE_IO"] = "0"
    b = video_io.load_video(frames_dir, resize=(70, 98))
    os.environ.pop("DINO_TRACKER_NATIVE_IO")
    assert a.shape == b.shape
    assert np.abs(a - b).max() < 0.02


def test_native_handles_missing_file(frames_dir):
    files = [os.path.join(frames_dir, "nope.jpg")]
    out = native_io.decode_resize_batch(files, 32, 32)
    assert out is None  # graceful failure -> caller falls back to PIL

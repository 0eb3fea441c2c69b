"""Parity tests: our grid sampling vs torch.nn.functional.grid_sample."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from dino_tracker_tpu.utils import sampling


RNG = np.random.default_rng(0)


def rand_grid(*shape):
    # include out-of-range coords to exercise padding
    return (RNG.random(shape, dtype=np.float32) * 2.6 - 1.3)


@pytest.mark.parametrize("padding", ["border", "zeros"])
@pytest.mark.parametrize("align", [True, False])
def test_grid_sample_2d_bilinear(padding, align):
    img = RNG.standard_normal((3, 9, 13)).astype(np.float32)
    grid = rand_grid(257, 2)
    ours = sampling.grid_sample_2d(jnp.asarray(img), jnp.asarray(grid),
                                   align_corners=align, padding_mode=padding)
    ref = F.grid_sample(torch.from_numpy(img)[None],
                        torch.from_numpy(grid)[None, None],
                        align_corners=align, padding_mode=padding,
                        mode="bilinear")[0, :, 0, :]
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


@pytest.mark.parametrize("padding", ["border", "zeros"])
def test_grid_sample_2d_nearest(padding):
    img = RNG.standard_normal((2, 7, 11)).astype(np.float32)
    grid = rand_grid(199, 2)
    ours = sampling.grid_sample_2d(jnp.asarray(img), jnp.asarray(grid),
                                   align_corners=True, padding_mode=padding,
                                   mode="nearest")
    ref = F.grid_sample(torch.from_numpy(img)[None],
                        torch.from_numpy(grid)[None, None],
                        align_corners=True, padding_mode=padding,
                        mode="nearest")[0, :, 0, :]
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-6)


@pytest.mark.parametrize("padding", ["border", "zeros"])
def test_grid_sample_3d_trilinear(padding):
    vol = RNG.standard_normal((4, 5, 9, 13)).astype(np.float32)  # C,T,H,W
    pts = rand_grid(311, 3)
    ours = sampling.grid_sample_3d(jnp.asarray(vol), jnp.asarray(pts),
                                   align_corners=True, padding_mode=padding)
    # torch 5D: input N,C,D,H,W; grid N,Do,Ho,Wo,3 with (x,y,z)
    ref = F.grid_sample(torch.from_numpy(vol)[None],
                        torch.from_numpy(pts)[None, None, None],
                        align_corners=True, padding_mode=padding)[0, :, 0, 0, :]
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_sample_feature_video_matches_reference_semantics():
    """Reference utils.py:75-101: x/y already normalized, t raw frame index."""
    t, c, h, w = 6, 8, 10, 12
    feats = RNG.standard_normal((t, c, h, w)).astype(np.float32)
    pts = np.stack([rand_grid(64), rand_grid(64),
                    RNG.random(64, dtype=np.float32) * (t - 1)], axis=-1)

    ours = sampling.sample_feature_video(jnp.asarray(feats), jnp.asarray(pts))

    # reference computation with torch
    samples = torch.from_numpy(pts)[None, None, :, None].clone()
    samples[..., 2] = samples[..., 2] / (t - 1) * 2 - 1
    vid = torch.from_numpy(feats).permute(1, 0, 2, 3)[None]  # 1,C,T,H,W
    ref = F.grid_sample(vid, samples, align_corners=True,
                        padding_mode="border")  # 1,C,1,B,1
    ref = ref[0, :, 0, :, 0].T  # B×C
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_bilinear_sampler_pixel():
    img = RNG.standard_normal((2, 3, 15, 17)).astype(np.float32)
    coords = np.stack([RNG.random((2, 5, 6), dtype=np.float32) * 20 - 2,
                       RNG.random((2, 5, 6), dtype=np.float32) * 18 - 2],
                      axis=-1)
    ours = sampling.bilinear_sampler_pixel(jnp.asarray(img), jnp.asarray(coords))

    timg = torch.from_numpy(img)
    xg = 2 * torch.from_numpy(coords[..., 0]) / (17 - 1) - 1
    yg = 2 * torch.from_numpy(coords[..., 1]) / (15 - 1) - 1
    ref = F.grid_sample(timg, torch.stack([xg, yg], dim=-1), align_corners=True)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_grid_sample_differentiable():
    import jax
    img = jnp.asarray(RNG.standard_normal((3, 9, 13)).astype(np.float32))
    grid = jnp.asarray(rand_grid(17, 2))

    g_img = jax.grad(lambda im: sampling.grid_sample_2d(im, grid).sum())(img)
    g_grid = jax.grad(lambda g: sampling.grid_sample_2d(img, g).sum())(grid)
    assert np.isfinite(np.asarray(g_img)).all()
    assert np.isfinite(np.asarray(g_grid)).all()
    assert np.abs(np.asarray(g_grid)).sum() > 0

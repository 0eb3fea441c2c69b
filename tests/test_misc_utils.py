"""Small utility coverage: resize_flow, start/end indices, attention maps."""

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from dino_tracker_tpu.utils.video_io import resize_flow
from dino_tracker_tpu.preprocessing.split_fg_bg import generate_start_end

RNG = np.random.default_rng(43)


def test_resize_flow_scales_vectors():
    flow = np.zeros((1, 2, 10, 20), np.float32)
    flow[:, 0] = 4.0  # x displacement
    flow[:, 1] = 2.0
    out = resize_flow(flow, newh=20, neww=10)
    assert out.shape == (1, 2, 20, 10)
    np.testing.assert_allclose(out[0, 0], 4.0 * 10 / 20, atol=1e-5)
    np.testing.assert_allclose(out[0, 1], 2.0 * 20 / 10, atol=1e-5)


def test_generate_start_end():
    t = 6
    traj = np.full((2, t, 2), np.nan, np.float32)
    traj[0, 1:4] = 1.0
    traj[1, 0] = 1.0
    traj[1, 5] = 1.0  # gaps allowed; first=0 last=5
    se = generate_start_end(traj)
    np.testing.assert_array_equal(se, [[1, 3], [0, 5]])


def test_attention_maps_rows_sum_to_one():
    from dino_tracker_tpu.models.vit import ViTConfig, init_vit, attention_maps
    cfg = ViTConfig(embed_dim=32, depth=2, num_heads=4, mlp_ratio=2,
                    patch_size=14, pretrain_grid=5)
    params = init_vit(jax.random.PRNGKey(0), cfg)
    img = jnp.asarray(RNG.random((1, 3, 42, 56), dtype=np.float32))
    attn = attention_maps(params, img, cfg, stride=7, layer=1)
    assert attn.shape == (1, 4, 36, 36)
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, atol=1e-5)

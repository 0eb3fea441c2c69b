"""ViT parity tests: bicubic pos-embed resize, flash-vs-XLA attention, and a
full forward against a torch mirror of the DINOv2 architecture with the
reference's overlapping-patch + pos-embed-interpolation semantics."""

import math

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from dino_tracker_tpu.models import vit as jvit
from dino_tracker_tpu.models.vit import ViTConfig
from dino_tracker_tpu.models.vit_convert import convert_dinov2_state_dict
from dino_tracker_tpu.ops import attention as attn_ops
from dino_tracker_tpu.utils.resize import bicubic_resize_torch

RNG = np.random.default_rng(17)


# ---------------------------------------------------------------------------
# bicubic resize
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("in_hw,out_hw,scales", [
    ((5, 5), (9, 13), ((9 + 0.1) / 5, (13 + 0.1) / 5)),
    ((37, 37), (67, 121), ((67 + 0.1) / 37, (121 + 0.1) / 37)),
    ((8, 6), (16, 12), (None, None)),
])
def test_bicubic_matches_torch(in_hw, out_hw, scales):
    img = RNG.standard_normal((3, *in_hw)).astype(np.float32)
    sh, sw = scales
    ours = bicubic_resize_torch(jnp.asarray(img), out_hw[0], out_hw[1], sh, sw)
    timg = torch.from_numpy(img)[None]
    if sh is None:
        ref = F.interpolate(timg, size=out_hw, mode="bicubic",
                            align_corners=False)
    else:
        ref = F.interpolate(timg, scale_factor=(sh, sw), mode="bicubic",
                            align_corners=False, recompute_scale_factor=False)
    assert ref.shape[-2:] == tuple(out_hw)
    np.testing.assert_allclose(np.asarray(ours), ref[0].numpy(), atol=2e-5)


# ---------------------------------------------------------------------------
# flash attention vs XLA
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("s,block", [(256, 128), (384, 128)])
def test_flash_attention_matches_xla(s, block):
    from dino_tracker_tpu.ops.flash_attention import flash_attention
    b, h, d = 1, 2, 64
    q = RNG.standard_normal((b, h, s, d)).astype(np.float32)
    k = RNG.standard_normal((b, h, s, d)).astype(np.float32)
    v = RNG.standard_normal((b, h, s, d)).astype(np.float32)
    scale = 1.0 / math.sqrt(d)
    ref = attn_ops.xla_attention(*map(jnp.asarray, (q, k, v)), sm_scale=scale)
    out = flash_attention(jnp.asarray(q).reshape(b * h, s, d),
                          jnp.asarray(k).reshape(b * h, s, d),
                          jnp.asarray(v).reshape(b * h, s, d),
                          sm_scale=scale, block_q=block, block_k_major=block,
                          block_k=block, interpret=True)
    np.testing.assert_allclose(np.asarray(out).reshape(b, h, s, d),
                               np.asarray(ref), atol=2e-5)


def test_flash_attention_padding_mask():
    """Padded keys must not affect valid rows."""
    from dino_tracker_tpu.ops.flash_attention import flash_attention
    s, pad_s, d = 100, 128, 64
    q = RNG.standard_normal((1, s, d)).astype(np.float32)
    k = RNG.standard_normal((1, s, d)).astype(np.float32)
    v = RNG.standard_normal((1, s, d)).astype(np.float32)
    scale = 1.0 / math.sqrt(d)
    qp = np.zeros((1, pad_s, d), np.float32); qp[:, :s] = q
    kp = np.zeros((1, pad_s, d), np.float32); kp[:, :s] = k + 100.0  # poison
    kp[:, :s] = k
    kp[:, s:] = 50.0  # large values in padding — must be masked
    vp = np.zeros((1, pad_s, d), np.float32); vp[:, :s] = v
    out = flash_attention(jnp.asarray(qp), jnp.asarray(kp), jnp.asarray(vp),
                          sm_scale=scale, valid_len=s, block_q=128,
                          block_k_major=128, block_k=128, interpret=True)
    ref = attn_ops.xla_attention(jnp.asarray(q)[:, None], jnp.asarray(k)[:, None],
                                 jnp.asarray(v)[:, None], sm_scale=scale)[:, 0]
    np.testing.assert_allclose(np.asarray(out)[:, :s], np.asarray(ref),
                               atol=2e-5)


# ---------------------------------------------------------------------------
# torch mirror of DINOv2 (small config)
# ---------------------------------------------------------------------------

class TorchDinoV2(tnn.Module):
    """Minimal DinoVisionTransformer mirror with the reference's stride
    override + pos-embed interpolation (models/extractor.py:41-85)."""

    def __init__(self, cfg: ViTConfig, stride: int):
        super().__init__()
        d = cfg.embed_dim
        self.cfg = cfg
        self.stride = stride
        self.patch_proj = tnn.Conv2d(3, d, cfg.patch_size, stride=stride)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, d) * 0.02)
        n = cfg.pretrain_grid ** 2
        self.pos_embed = tnn.Parameter(torch.randn(1, 1 + n, d) * 0.02)
        self.blocks = tnn.ModuleList()
        for _ in range(cfg.depth):
            blk = tnn.ModuleDict({
                "norm1": tnn.LayerNorm(d, eps=cfg.ln_eps),
                "qkv": tnn.Linear(d, 3 * d),
                "proj": tnn.Linear(d, d),
                "norm2": tnn.LayerNorm(d, eps=cfg.ln_eps),
                "fc1": tnn.Linear(d, cfg.mlp_ratio * d),
                "fc2": tnn.Linear(cfg.mlp_ratio * d, d),
            })
            if cfg.layerscale:
                blk.ls1 = tnn.Parameter(torch.rand(d) * 2)
                blk.ls2 = tnn.Parameter(torch.rand(d) * 2)
            self.blocks.append(blk)

    def interpolate_pos_encoding(self, x, w, h):
        """Exact reference math (extractor.py:57-85); note the upstream
        naming quirk: the caller passes w=shape[2] (rows), h=shape[3]."""
        npatch = x.shape[1] - 1
        N = self.pos_embed.shape[1] - 1
        patch_size, stride_hw = self.cfg.patch_size, (self.stride, self.stride)
        class_pos_embed = self.pos_embed[:, 0]
        patch_pos_embed = self.pos_embed[:, 1:]
        dim = x.shape[-1]
        w0 = 1 + (w - patch_size) // stride_hw[1]
        h0 = 1 + (h - patch_size) // stride_hw[0]
        assert w0 * h0 == npatch
        w0, h0 = w0 + 0.1, h0 + 0.1
        patch_pos_embed = tnn.functional.interpolate(
            patch_pos_embed.reshape(1, int(math.sqrt(N)), int(math.sqrt(N)),
                                    dim).permute(0, 3, 1, 2),
            scale_factor=(w0 / math.sqrt(N), h0 / math.sqrt(N)),
            mode="bicubic", align_corners=False, recompute_scale_factor=False)
        patch_pos_embed = patch_pos_embed.permute(0, 2, 3, 1).view(1, -1, dim)
        return torch.cat((class_pos_embed.unsqueeze(0), patch_pos_embed), dim=1)

    def forward(self, img, return_layers):
        # DINOv2 prepare_tokens_with_masks unpacks B, nc, w, h = x.shape —
        # "w" is actually the height; we reproduce that call convention.
        B, nc, w, h = img.shape
        x = self.patch_proj(img).flatten(2).transpose(1, 2)  # B×S×D
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.interpolate_pos_encoding(x, w, h)
        outs = []
        heads = self.cfg.num_heads
        for blk in self.blocks:
            y = blk["norm1"](x)
            qkv = blk["qkv"](y)
            b, s, _ = y.shape
            q, k, v = qkv.reshape(b, s, 3, heads, -1).permute(2, 0, 3, 1, 4)
            att = F.scaled_dot_product_attention(q, k, v)
            att = att.transpose(1, 2).reshape(b, s, -1)
            ls1 = blk.ls1 if self.cfg.layerscale else 1.0
            ls2 = blk.ls2 if self.cfg.layerscale else 1.0
            x = x + ls1 * blk["proj"](att)
            y = blk["norm2"](x)
            x = x + ls2 * blk["fc2"](F.gelu(blk["fc1"](y)))
            outs.append(x)
        return [outs[i] for i in return_layers]

    def state_dict_dinov2(self):
        """Rename mirror params to official DINOv2 state-dict keys."""
        sd = {
            "patch_embed.proj.weight": self.patch_proj.weight,
            "patch_embed.proj.bias": self.patch_proj.bias,
            "cls_token": self.cls_token,
            "pos_embed": self.pos_embed,
        }
        for i, blk in enumerate(self.blocks):
            p = f"blocks.{i}."
            sd[p + "norm1.weight"] = blk["norm1"].weight
            sd[p + "norm1.bias"] = blk["norm1"].bias
            sd[p + "attn.qkv.weight"] = blk["qkv"].weight
            sd[p + "attn.qkv.bias"] = blk["qkv"].bias
            sd[p + "attn.proj.weight"] = blk["proj"].weight
            sd[p + "attn.proj.bias"] = blk["proj"].bias
            sd[p + "norm2.weight"] = blk["norm2"].weight
            sd[p + "norm2.bias"] = blk["norm2"].bias
            sd[p + "mlp.fc1.weight"] = blk["fc1"].weight
            sd[p + "mlp.fc1.bias"] = blk["fc1"].bias
            sd[p + "mlp.fc2.weight"] = blk["fc2"].weight
            sd[p + "mlp.fc2.bias"] = blk["fc2"].bias
            if self.cfg.layerscale:
                sd[p + "ls1.gamma"] = blk.ls1
                sd[p + "ls2.gamma"] = blk.ls2
        return sd


SMALL = ViTConfig(embed_dim=32, depth=3, num_heads=4, mlp_ratio=2,
                  patch_size=14, pretrain_grid=5)


def test_vit_forward_parity_with_torch_mirror():
    stride = 7
    h, w = 42, 56  # grid 5×7 = 35 tokens
    tmodel = TorchDinoV2(SMALL, stride)
    tmodel.eval()
    params = convert_dinov2_state_dict(tmodel.state_dict_dinov2(), SMALL)

    img = RNG.standard_normal((2, 3, h, w)).astype(np.float32)
    with torch.no_grad():
        ref_layers = tmodel(torch.from_numpy(img), return_layers=[1, 2])

    outs, grid_hw = jvit.forward_features(params, jnp.asarray(img), SMALL,
                                          stride, layers=[1, 2],
                                          facet="tokens", attn_impl="xla")
    assert grid_hw == (5, 7)
    for ours, ref in zip(outs, ref_layers):
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=5e-4)


SMALL_V1 = ViTConfig(embed_dim=32, depth=3, num_heads=4, mlp_ratio=2,
                     patch_size=8, pretrain_grid=6, layerscale=False)


def test_vit_v1_forward_parity_with_torch_mirror():
    """DINO-v1 preset (patch 8, no layerscale) against the torch mirror with
    the same overlapping-stride + pos-embed interpolation semantics."""
    stride = 4
    h, w = 32, 40  # grid 7×9 = 63 tokens
    tmodel = TorchDinoV2(SMALL_V1, stride)
    tmodel.eval()
    params = convert_dinov2_state_dict(tmodel.state_dict_dinov2(), SMALL_V1)
    assert "ls1" not in params["blocks"][0]

    img = RNG.standard_normal((2, 3, h, w)).astype(np.float32)
    with torch.no_grad():
        ref_layers = tmodel(torch.from_numpy(img), return_layers=[2])

    outs, grid_hw = jvit.forward_features(params, jnp.asarray(img), SMALL_V1,
                                          stride, layers=[2],
                                          facet="tokens", attn_impl="xla")
    assert grid_hw == (7, 9)
    np.testing.assert_allclose(np.asarray(outs[0]), ref_layers[0].numpy(),
                               atol=5e-4)


def test_for_model_presets():
    """Both hub families resolve (reference models/extractor.py:26-28)."""
    v2 = ViTConfig.for_model("dinov2_vitl14")
    assert (v2.embed_dim, v2.depth, v2.patch_size, v2.layerscale) == (
        1024, 24, 14, True)
    for name, dim, patch in [("dino_vits8", 384, 8), ("dino_vits16", 384, 16),
                             ("dino_vitb8", 768, 8), ("dino_vitb16", 768, 16)]:
        cfg = ViTConfig.for_model(name)
        assert (cfg.embed_dim, cfg.patch_size, cfg.layerscale) == (
            dim, patch, False), name
        assert cfg.pretrain_grid == 224 // patch
    import pytest as _pytest
    with _pytest.raises(ValueError):
        ViTConfig.for_model("dino_vitl16")  # v1 hub has no ViT-L


def test_vit_qkv_facets():
    stride = 7
    tmodel = TorchDinoV2(SMALL, stride)
    params = convert_dinov2_state_dict(tmodel.state_dict_dinov2(), SMALL)
    img = RNG.standard_normal((1, 3, 42, 56)).astype(np.float32)
    for facet in ["keys", "queries", "values"]:
        outs, _ = jvit.forward_features(params, jnp.asarray(img), SMALL,
                                        stride, layers=[1], facet=facet,
                                        attn_impl="xla")
        assert outs[0].shape == (1, 36, 32)  # 35 patches + cls


def test_extract_feature_video_shape_and_batching():
    tmodel = TorchDinoV2(SMALL, 7)
    params = convert_dinov2_state_dict(tmodel.state_dict_dinov2(), SMALL)
    video = jnp.asarray(RNG.random((5, 3, 42, 56), dtype=np.float32))
    feats = jvit.extract_feature_video(params, video, SMALL, stride=7,
                                       layer=1, frames_per_batch=2,
                                       attn_impl="xla")
    assert feats.shape == (5, 32, 5, 7)
    # batched == unbatched
    feats1 = jvit.extract_feature_video(params, video, SMALL, stride=7,
                                        layer=1, frames_per_batch=5,
                                        attn_impl="xla")
    np.testing.assert_allclose(np.asarray(feats), np.asarray(feats1), atol=1e-5)


def test_extract_feature_video_multi_layer_single_pass():
    """A layer list returns per-layer feature videos identical to separate
    single-layer sweeps (one ViT traversal for all of them)."""
    tmodel = TorchDinoV2(SMALL, 7)
    params = convert_dinov2_state_dict(tmodel.state_dict_dinov2(), SMALL)
    video = jnp.asarray(RNG.random((3, 3, 42, 56), dtype=np.float32))
    multi = jvit.extract_feature_video(params, video, SMALL, stride=7,
                                       layer=[0, 2], frames_per_batch=2,
                                       attn_impl="xla")
    assert isinstance(multi, list) and len(multi) == 2
    for li, got in zip([0, 2], multi):
        single = jvit.extract_feature_video(params, video, SMALL, stride=7,
                                            layer=li, frames_per_batch=2,
                                            attn_impl="xla")
        np.testing.assert_allclose(np.asarray(got), np.asarray(single),
                                   atol=1e-5)


def test_extract_feature_video_mesh_matches_single_device():
    """Frame-axis sharding over the 8-device CPU mesh must not change
    features (frames_per_batch rounds up to the mesh size)."""
    from dino_tracker_tpu.parallel.mesh import make_mesh

    tmodel = TorchDinoV2(SMALL, 7)
    params = convert_dinov2_state_dict(tmodel.state_dict_dinov2(), SMALL)
    video = jnp.asarray(RNG.random((5, 3, 42, 56), dtype=np.float32))
    base = jvit.extract_feature_video(params, video, SMALL, stride=7,
                                      layer=2, frames_per_batch=2,
                                      attn_impl="xla")
    sharded = jvit.extract_feature_video(params, video, SMALL, stride=7,
                                         layer=2, frames_per_batch=2,
                                         attn_impl="xla", mesh=make_mesh(8))
    np.testing.assert_allclose(np.asarray(base), np.asarray(sharded),
                               atol=1e-5)


def test_extraction_bf16_close_to_f32():
    """bf16 extraction features stay directionally faithful (cos ≥ 0.995)."""
    tmodel = TorchDinoV2(SMALL, 7)
    params = convert_dinov2_state_dict(tmodel.state_dict_dinov2(), SMALL)
    video = jnp.asarray(RNG.random((2, 3, 42, 56), dtype=np.float32))
    f32 = np.asarray(jvit.extract_feature_video(
        params, video, SMALL, stride=7, layer=2, attn_impl="xla"))
    bf16 = np.asarray(jvit.extract_feature_video(
        params, video, SMALL, stride=7, layer=2, attn_impl="xla",
        compute_dtype=jnp.bfloat16))
    a = f32.reshape(2, 32, -1)
    b = bf16.reshape(2, 32, -1)
    cos = (a * b).sum(1) / (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1))
    assert cos.min() > 0.995, cos.min()


def test_forward_features_rejects_out_of_range_layer():
    """The layer-15/23 config defaults are ViT-L values; a smaller model must
    fail with a clear error, not a cryptic scan shape mismatch (found by
    driving cli.preprocess with dinov2_vits14)."""
    import pytest

    params = jvit.init_vit(jax.random.PRNGKey(0), SMALL)
    img = jnp.asarray(RNG.standard_normal((1, 3, 42, 56)).astype(np.float32))
    with pytest.raises(ValueError, match="out of range for a 3-block"):
        jvit.forward_features(params, img, SMALL, 7, layers=[1, 15],
                              facet="tokens", attn_impl="xla")

"""From-scratch DINOv2 ViT with overlapping-patch (stride < patch) support.

The feature extractor of the pipeline (reference models/extractor.py
``VitExtractor`` wrapping torch.hub DINOv2): a ViT-L/14 whose patch-embed
conv runs at stride 7 (67×121 = 8107 tokens at 854×476) with the positional
embedding bicubically interpolated to the stride-7 grid
(models/extractor.py:41-85). Facets: per-block token outputs and per-block
q/k/v (models/extractor.py:137-267).

TPU design: functional param pytrees (converted 1:1 from the torch
checkpoint by vit_convert.py), frames batched on the leading axis and
shardable across chips, attention via the Pallas flash kernel
(ops/flash_attention.py), bf16 compute with f32 accumulation.

Architecture (DINOv2 DinoVisionTransformer, non-register variants):
  x = patch_embed(img) ++ cls;  x += interp(pos_embed)
  block: x += ls1·attn(norm1(x));  x += ls2·mlp(norm2(x))   (LN eps 1e-6)
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from ..utils.resize import bicubic_resize_torch


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: int = 4
    patch_size: int = 14
    pretrain_grid: int = 37  # √N of the pretrain pos-embed (518/14)
    layerscale: bool = True
    ln_eps: float = 1e-6

    @classmethod
    def for_model(cls, model_name: str) -> "ViTConfig":
        """Presets for both hub families the reference loads
        (models/extractor.py:26-28): dinov2_vit{s,b,l,g}14 from
        facebookresearch/dinov2 when the name contains "v2", otherwise the
        DINO-v1 dino_vit{s,b}{8,16} models from facebookresearch/dino:main
        (patch 8/16, pretrained at 224 → pos-embed grid 224/patch, standard
        pre-LN blocks WITHOUT layerscale)."""
        presets = {
            "s": dict(embed_dim=384, depth=12, num_heads=6),
            "b": dict(embed_dim=768, depth=12, num_heads=12),
            "l": dict(embed_dim=1024, depth=24, num_heads=16),
            "g": dict(embed_dim=1536, depth=40, num_heads=24),
        }
        for key, kw in presets.items():
            if f"vit{key}" not in model_name:
                continue
            if "v2" in model_name:
                return cls(**kw)
            if key not in ("s", "b"):
                break  # v1 hub only ships ViT-S and ViT-B
            patch = 8 if model_name.rstrip().endswith("8") else 16
            return cls(patch_size=patch, pretrain_grid=224 // patch,
                       layerscale=False, **kw)
        raise ValueError(f"unknown model name {model_name}")


IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def init_vit(key, cfg: ViTConfig, dtype=jnp.float32):
    """Randomly initialized params (same pytree layout the converter fills)."""
    d = cfg.embed_dim
    n = cfg.pretrain_grid ** 2
    keys = jax.random.split(key, 2 + cfg.depth)

    def linear(k, din, dout):
        scale = 1.0 / math.sqrt(din)
        kw, kb = jax.random.split(k)
        return {"w": jax.random.uniform(kw, (din, dout), dtype, -scale, scale),
                "b": jax.random.uniform(kb, (dout,), dtype, -scale, scale)}

    params = {
        "patch_embed": {
            "w": jax.random.normal(keys[0], (cfg.patch_size, cfg.patch_size, 3, d),
                                   dtype) * 0.02,
            "b": jnp.zeros((d,), dtype),
        },
        "cls_token": jax.random.normal(keys[1], (1, 1, d), dtype) * 0.02,
        "pos_embed": jnp.zeros((1, 1 + n, d), dtype),
        "blocks": [],
    }
    for i in range(cfg.depth):
        k1, k2, k3, k4 = jax.random.split(keys[2 + i], 4)
        block = {
            "norm1": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "attn": {"qkv": linear(k1, d, 3 * d), "proj": linear(k2, d, d)},
            "norm2": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "mlp": {"fc1": linear(k3, d, cfg.mlp_ratio * d),
                    "fc2": linear(k4, cfg.mlp_ratio * d, d)},
        }
        if cfg.layerscale:
            block["ls1"] = jnp.ones((d,), dtype)
            block["ls2"] = jnp.ones((d,), dtype)
        params["blocks"].append(block)
    return params


def layer_norm(x, p, eps: float):
    # statistics in f32 regardless of the compute dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def patch_embed(params, frames_nchw, stride: int):
    """Overlapping-patch conv: N×3×H×W -> N×(h0·w0)×D, h0 = 1+(H-patch)//stride
    (the stride-override trick, reference extractor.py:41-55)."""
    x = jnp.transpose(frames_nchw, (0, 2, 3, 1))  # NHWC
    preferred = jnp.float32 if x.dtype == jnp.float32 else None
    out = jax.lax.conv_general_dilated(
        x, params["patch_embed"]["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred)
    out = out + params["patch_embed"]["b"].astype(out.dtype)
    n, h0, w0, d = out.shape
    return out.reshape(n, h0 * w0, d), (h0, w0)


def interpolate_pos_embed(params, grid_hw: Tuple[int, int], cfg: ViTConfig):
    """Bicubic pos-embed interpolation with the reference's exact +0.1 /
    explicit-scale semantics (extractor.py:57-85). Returns (1, 1+h0·w0, D)."""
    h0, w0 = grid_hw
    m = cfg.pretrain_grid
    d = cfg.embed_dim
    if (h0, w0) == (m, m):
        return params["pos_embed"]
    cls_pos = params["pos_embed"][:, :1]
    patch_pos = params["pos_embed"][0, 1:].reshape(m, m, d)
    patch_pos = jnp.transpose(patch_pos, (2, 0, 1))  # D×m×m
    scale_h = (h0 + 0.1) / m
    scale_w = (w0 + 0.1) / m
    resized = bicubic_resize_torch(patch_pos, h0, w0, scale_h, scale_w)
    resized = jnp.transpose(resized, (1, 2, 0)).reshape(1, h0 * w0, d)
    return jnp.concatenate([cls_pos, resized], axis=1)


def vit_block(block, x, cfg: ViTConfig, attn_impl: str = "auto",
              collect_qkv: bool = False):
    """One ViT block; returns (x_out, qkv or None)."""
    b, s, d = x.shape
    h = cfg.num_heads
    hd = d // h

    y = layer_norm(x, block["norm1"], cfg.ln_eps)
    qkv = y @ block["attn"]["qkv"]["w"] + block["attn"]["qkv"]["b"]  # B×S×3D
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):  # B×S×D -> B×H×S×hd
        return jnp.transpose(t.reshape(b, s, h, hd), (0, 2, 1, 3))

    attn_out = multi_head_attention(heads(q), heads(k), heads(v),
                                    sm_scale=1.0 / math.sqrt(hd),
                                    impl=attn_impl)
    attn_out = jnp.transpose(attn_out, (0, 2, 1, 3)).reshape(b, s, d)
    attn_out = attn_out @ block["attn"]["proj"]["w"] + block["attn"]["proj"]["b"]
    if "ls1" in block:
        attn_out = attn_out * block["ls1"]
    x = x + attn_out

    y = layer_norm(x, block["norm2"], cfg.ln_eps)
    y = y @ block["mlp"]["fc1"]["w"] + block["mlp"]["fc1"]["b"]
    y = jax.nn.gelu(y, approximate=False)
    y = y @ block["mlp"]["fc2"]["w"] + block["mlp"]["fc2"]["b"]
    if "ls2" in block:
        y = y * block["ls2"]
    x = x + y
    return x, (qkv if collect_qkv else None)


def stack_block_params(blocks):
    """List of per-block pytrees -> one pytree with a leading layer axis
    (the lax.scan layout)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def forward_features(params, frames_nchw, cfg: ViTConfig, stride: int,
                     layers: Sequence[int], facet: str = "tokens",
                     attn_impl: str = "auto"):
    """Run blocks 0..max(layers); return the requested facet per layer.

    facet 'tokens': block outputs (B×S×D, S includes cls at position 0);
    'keys'/'queries'/'values': slices of that block's qkv
    (reference extractor.py:137-267). Frames must already be imagenet-
    normalized.

    The depth loop is a lax.scan over stacked block params — one block
    compiles once instead of unrolling 24 copies into the XLA graph (the
    unrolled ViT-L program took minutes to compile on TPU).
    """
    x, grid_hw = patch_embed(params, frames_nchw, stride)
    b = x.shape[0]
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + interpolate_pos_embed(params, grid_hw, cfg)

    want_qkv = facet in ("keys", "queries", "values")
    depth = len(params["blocks"])
    bad = [l for l in layers if not 0 <= l < depth]
    if bad:
        raise ValueError(
            f"requested ViT layer(s) {bad} out of range for a {depth}-block "
            f"model — the layer-15/23 defaults in config.py are ViT-L/14 "
            f"values; set dino_layer/mask_dino_layer to < {depth} for "
            f"smaller variants")
    max_layer = max(layers)
    layers = list(layers)
    stacked = stack_block_params(params["blocks"][: max_layer + 1])
    layer_ids = jnp.asarray(layers)

    def body(carry, scan_in):
        x, outs = carry
        i, blk = scan_in
        x, qkv = vit_block(blk, x, cfg, attn_impl, collect_qkv=want_qkv)
        current = qkv if want_qkv else x
        hit = (layer_ids == i)  # n_out bools
        outs = jnp.where(hit[:, None, None, None], current[None], outs)
        return (x, outs), None

    out_shape = ((b, x.shape[1], 3 * cfg.embed_dim) if want_qkv
                 else (b, x.shape[1], cfg.embed_dim))
    outs0 = jnp.zeros((len(layers),) + out_shape, x.dtype)
    (_, outs), _ = jax.lax.scan(
        body, (x, outs0), (jnp.arange(max_layer + 1), stacked))

    outputs: List[jnp.ndarray] = []
    for idx in range(len(layers)):
        o = outs[idx]
        if want_qkv:
            s = o.shape[1]
            qkv3 = o.reshape(b, s, 3, cfg.embed_dim)
            sel = {"queries": 0, "keys": 1, "values": 2}[facet]
            o = qkv3[:, :, sel, :]
        outputs.append(o)
    return outputs, grid_hw


def extract_feature_video(params, video_tchw, cfg: ViTConfig, stride: int = 7,
                          layer=None, facet: str = "tokens",
                          frames_per_batch: int = 4, attn_impl: str = "auto",
                          compute_dtype=jnp.float32, mesh=None):
    """video (T×3×H×W, [0,1]) -> feature video(s) T×D×h0×w0
    (reference utils.py:33-72 ``get_dino_features_video``).

    ``layer`` may be an int (returns one array) or a sequence of ints
    (returns a list, one ViT sweep total — the scan in forward_features
    collects every requested layer in a single pass, so e.g. the training
    layer 15 and the mask layer 23 cost one traversal, not two).

    Frame-batched; pass ``mesh`` to shard the frame axis across chips
    (parallel/mesh.py DATA_AXIS).
    """
    t = video_tchw.shape[0]
    single = layer is None or isinstance(layer, int)
    if layer is None:
        layers = [cfg.depth - 1]
    elif isinstance(layer, int):
        layers = [layer]
    else:
        layers = list(layer)
    mean = jnp.asarray(IMAGENET_MEAN).reshape(1, 3, 1, 1)
    std = jnp.asarray(IMAGENET_STD).reshape(1, 3, 1, 1)
    from ..parallel.mesh import constrain_batch

    @jax.jit
    def run(p, frames):
        # params enter as an argument — closing over them would bake 1.2 GB
        # of ViT-L weights into the program as constants
        if compute_dtype != jnp.float32:
            # genuine mixed precision: weights in the compute dtype too
            # (mixed-dtype matmuls would silently promote back to f32);
            # layer_norm keeps its statistics in f32 internally
            p = jax.tree.map(lambda a: a.astype(compute_dtype), p)
        frames_s = constrain_batch(frames, mesh)
        x = ((frames_s - mean) / std).astype(compute_dtype)
        outs, grid_hw = forward_features(p, x, cfg, stride, layers,
                                         facet, attn_impl)
        h0, w0 = grid_hw
        results = []
        for o in outs:
            tokens = o[:, 1:, :]  # drop cls
            n = tokens.shape[0]
            r = jnp.transpose(tokens, (0, 2, 1)).reshape(
                n, cfg.embed_dim, h0, w0).astype(jnp.float32)
            results.append(constrain_batch(r, mesh))
        return tuple(results)

    def dispatch(frames):
        if mesh is not None:
            with mesh:
                return run(params, frames)
        return run(params, frames)

    from ..utils.retry import retry_transient
    n_dev = mesh.devices.size if mesh is not None else 1
    bsz = max(frames_per_batch, n_dev)
    bsz -= bsz % n_dev
    chunks = [[] for _ in layers]
    for s in range(0, t, bsz):
        e = min(s + bsz, t)
        frames = video_tchw[s:e]
        if e - s < bsz:
            pad = bsz - (e - s)
            frames = jnp.concatenate([frames, frames[-1:].repeat(pad, axis=0)])
        outs = retry_transient(lambda: dispatch(frames),
                               what="dino feature batch")
        for i, out in enumerate(outs):
            chunks[i].append(out[: e - s])
    results = [jnp.concatenate(c, axis=0) for c in chunks]
    return results[0] if single else results


def keys_self_similarity(params, frames_nchw, cfg: ViTConfig, stride: int,
                         layer: int, attn_impl: str = "auto"):
    """Cosine self-similarity of a layer's key facet across all tokens
    (reference extractor.py:269-274 ``get_keys_self_sim_from_input``).
    Returns B×S×S."""
    outs, _ = forward_features(params, frames_nchw, cfg, stride, [layer],
                               facet="keys", attn_impl=attn_impl)
    keys = outs[0]  # B×S×D
    norm = jnp.linalg.norm(keys, axis=-1, keepdims=True)
    normed = keys / jnp.clip(norm, min=1e-8)
    return jnp.einsum("bsd,btd->bst", normed, normed,
                      preferred_element_type=jnp.float32)


def attention_maps(params, frames_nchw, cfg: ViTConfig, stride: int,
                   layer: int):
    """Post-softmax attention maps of one block: B×H×S×S (reference
    extractor.py:118-122,160-166 captures attn via hooks). Materializes the
    full S×S map — use at coarse strides only."""
    x, grid_hw = patch_embed(params, frames_nchw, stride)
    b = x.shape[0]
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + interpolate_pos_embed(params, grid_hw, cfg)
    if layer > 0:
        # scan the prefix blocks like forward_features does — python-
        # unrolling e.g. 23 ViT-L blocks into one XLA graph is the exact
        # compile-time hazard the scan exists to avoid
        stacked = stack_block_params(params["blocks"][:layer])

        def body(x, blk):
            x, _ = vit_block(blk, x, cfg, attn_impl="xla")
            return x, None

        x, _ = jax.lax.scan(body, x, stacked)
    block = params["blocks"][layer]
    y = layer_norm(x, block["norm1"], cfg.ln_eps)
    qkv = y @ block["attn"]["qkv"]["w"] + block["attn"]["qkv"]["b"]
    q, k, _ = jnp.split(qkv, 3, axis=-1)
    s_len, d = x.shape[1], cfg.embed_dim
    hd = d // cfg.num_heads
    qh = jnp.transpose(q.reshape(b, s_len, cfg.num_heads, hd), (0, 2, 1, 3))
    kh = jnp.transpose(k.reshape(b, s_len, cfg.num_heads, hd), (0, 2, 1, 3))
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    return jax.nn.softmax(logits, axis=-1)

"""Convert a DINOv2 torch checkpoint (state_dict) into our ViT param pytree.

The environment/pipeline gets pretrained weights from a local torch
checkpoint file (e.g. dumped from torch.hub facebookresearch/dinov2 on a
machine with network access); this converter maps the official DINOv2
``DinoVisionTransformer`` state-dict keys onto models/vit.py's pytree.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp

from .vit import ViTConfig


def convert_dinov2_state_dict(sd: Dict[str, "object"], cfg: ViTConfig):
    """sd: mapping of DINOv2 param names -> array-likes (torch tensors or
    numpy arrays). Returns the params pytree for models/vit.py."""
    def a(name):
        t = sd[name]
        arr = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
        return jnp.asarray(arr, jnp.float32)

    d = cfg.embed_dim
    params = {
        "patch_embed": {
            # torch conv OIHW -> HWIO
            "w": jnp.transpose(a("patch_embed.proj.weight"), (2, 3, 1, 0)),
            "b": a("patch_embed.proj.bias"),
        },
        "cls_token": a("cls_token").reshape(1, 1, d),
        "pos_embed": a("pos_embed"),
        "blocks": [],
    }
    for i in range(cfg.depth):
        p = f"blocks.{i}."
        block = {
            "norm1": {"scale": a(p + "norm1.weight"), "bias": a(p + "norm1.bias")},
            "attn": {
                "qkv": {"w": a(p + "attn.qkv.weight").T,
                        "b": a(p + "attn.qkv.bias")},
                "proj": {"w": a(p + "attn.proj.weight").T,
                         "b": a(p + "attn.proj.bias")},
            },
            "norm2": {"scale": a(p + "norm2.weight"), "bias": a(p + "norm2.bias")},
            "mlp": {
                "fc1": {"w": a(p + "mlp.fc1.weight").T, "b": a(p + "mlp.fc1.bias")},
                "fc2": {"w": a(p + "mlp.fc2.weight").T, "b": a(p + "mlp.fc2.bias")},
            },
        }
        if cfg.layerscale:
            block["ls1"] = a(p + "ls1.gamma")
            block["ls2"] = a(p + "ls2.gamma")
        params["blocks"].append(block)
    return params


def load_dinov2_checkpoint(path: str, model_name: str = "dinov2_vitl14"):
    """Load a torch-saved DINOv2 state dict (or a raw .npz dump) from disk."""
    cfg = ViTConfig.for_model(model_name)
    if path.endswith(".npz"):
        with np.load(path) as f:
            sd = {k: f[k] for k in f.files}
    else:
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "model" in sd:
            sd = sd["model"]
    return convert_dinov2_state_dict(sd, cfg), cfg

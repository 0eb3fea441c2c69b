"""Generate random-weight checkpoints in the REAL published layouts.

Produces (a) a princeton-vl RAFT checkpoint (``module.``-prefixed torch state
dict, the raft-things.pth layout) and (b) a DINOv2 state-dict ``.npz`` with
the official ``DinoVisionTransformer`` keys. These exercise the exact same
converter code paths (models/raft.py convert_raft_state_dict,
models/vit_convert.py load_dinov2_checkpoint) as real pretrained weights, so
the end-to-end pipeline and the accuracy-parity harness can run in this
no-network environment; swap in real files for accuracy parity.

Usage:
    python scripts/gen_random_ckpts.py --out-dir /tmp/ckpts \
        [--dino-model dinov2_vitl14] [--seed 0]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def _conv_to_torch(sd, name, p):
    # HWIO -> OIHW
    sd[name + ".weight"] = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))
    sd[name + ".bias"] = np.asarray(p["b"])


def _bn_to_torch(sd, name, p):
    sd[name + ".weight"] = np.asarray(p["scale"])
    sd[name + ".bias"] = np.asarray(p["bias"])
    sd[name + ".running_mean"] = np.asarray(p["mean"])
    sd[name + ".running_var"] = np.asarray(p["var"])


def raft_state_dict(seed: int) -> dict:
    """init_raft tree -> module.-prefixed princeton-vl layout."""
    from dino_tracker_tpu.models.raft import init_raft

    tree = init_raft(jax.random.PRNGKey(seed))
    sd = {}

    def enc(prefix, p, norm):
        _conv_to_torch(sd, prefix + ".conv1", p["conv1"])
        _conv_to_torch(sd, prefix + ".conv2", p["conv2"])
        if norm == "batch":
            _bn_to_torch(sd, prefix + ".norm1", p["norm1"])
        for li, layer in enumerate(("layer1", "layer2", "layer3"), start=1):
            for j, blk in enumerate(p[layer]):
                bp = f"{prefix}.layer{li}.{j}"
                _conv_to_torch(sd, bp + ".conv1", blk["conv1"])
                _conv_to_torch(sd, bp + ".conv2", blk["conv2"])
                if norm == "batch":
                    _bn_to_torch(sd, bp + ".norm1", blk["norm1"])
                    _bn_to_torch(sd, bp + ".norm2", blk["norm2"])
                if "downsample" in blk:
                    _conv_to_torch(sd, bp + ".downsample.0",
                                   blk["downsample"]["conv"])
                    if norm == "batch":
                        _bn_to_torch(sd, bp + ".downsample.1",
                                     blk["downsample"]["norm"])

    enc("fnet", tree["fnet"], "instance")
    enc("cnet", tree["cnet"], "batch")
    upd = tree["update"]
    for k, p in upd["enc"].items():
        _conv_to_torch(sd, f"update_block.encoder.{k}", p)
    for k, p in upd["gru"].items():
        _conv_to_torch(sd, f"update_block.gru.{k}", p)
    _conv_to_torch(sd, "update_block.flow_head.conv1", upd["flow_head"]["conv1"])
    _conv_to_torch(sd, "update_block.flow_head.conv2", upd["flow_head"]["conv2"])
    _conv_to_torch(sd, "update_block.mask.0", upd["mask"]["conv1"])
    _conv_to_torch(sd, "update_block.mask.2", upd["mask"]["conv2"])
    import torch
    return {"module." + k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in sd.items()}


def dinov2_npz(model_name: str, seed: int) -> dict:
    """init_vit tree -> official DINOv2 state-dict keys (numpy)."""
    from dino_tracker_tpu.models.vit import ViTConfig, init_vit

    cfg = ViTConfig.for_model(model_name)
    tree = init_vit(jax.random.PRNGKey(seed), cfg)
    sd = {
        # HWIO -> OIHW
        "patch_embed.proj.weight": np.transpose(
            np.asarray(tree["patch_embed"]["w"]), (3, 2, 0, 1)),
        "patch_embed.proj.bias": np.asarray(tree["patch_embed"]["b"]),
        "cls_token": np.asarray(tree["cls_token"]),
        # random pos-embed (init_vit zeros it; parity tests want nonzero)
        "pos_embed": np.random.default_rng(seed).standard_normal(
            tree["pos_embed"].shape).astype(np.float32) * 0.02,
    }
    for i, blk in enumerate(tree["blocks"]):
        p = f"blocks.{i}."
        sd[p + "norm1.weight"] = np.asarray(blk["norm1"]["scale"])
        sd[p + "norm1.bias"] = np.asarray(blk["norm1"]["bias"])
        sd[p + "attn.qkv.weight"] = np.asarray(blk["attn"]["qkv"]["w"]).T
        sd[p + "attn.qkv.bias"] = np.asarray(blk["attn"]["qkv"]["b"])
        sd[p + "attn.proj.weight"] = np.asarray(blk["attn"]["proj"]["w"]).T
        sd[p + "attn.proj.bias"] = np.asarray(blk["attn"]["proj"]["b"])
        sd[p + "norm2.weight"] = np.asarray(blk["norm2"]["scale"])
        sd[p + "norm2.bias"] = np.asarray(blk["norm2"]["bias"])
        sd[p + "mlp.fc1.weight"] = np.asarray(blk["mlp"]["fc1"]["w"]).T
        sd[p + "mlp.fc1.bias"] = np.asarray(blk["mlp"]["fc1"]["b"])
        sd[p + "mlp.fc2.weight"] = np.asarray(blk["mlp"]["fc2"]["w"]).T
        sd[p + "mlp.fc2.bias"] = np.asarray(blk["mlp"]["fc2"]["b"])
        if "ls1" in blk:
            sd[p + "ls1.gamma"] = np.asarray(blk["ls1"])
            sd[p + "ls2.gamma"] = np.asarray(blk["ls2"])
    return sd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--dino-model", default="dinov2_vitl14")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    import torch
    raft_path = os.path.join(args.out_dir, "raft-things.pth")
    torch.save(raft_state_dict(args.seed), raft_path)
    print("wrote", raft_path)

    dino_path = os.path.join(args.out_dir, f"{args.dino_model}.npz")
    np.savez(dino_path, **dinov2_npz(args.dino_model, args.seed))
    print("wrote", dino_path)


if __name__ == "__main__":
    main()

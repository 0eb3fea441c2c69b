"""Per-layer cost of DeltaDINO (the train step's compute floor) on device.

The r2 breakdown put DeltaDINO fwd+bwd at ~90 ms of the 163 ms step.
This probe times truncated conv stacks (layers 0..k) fwd and fwd+bwd to
attribute cost per layer, plus two formulation experiments:

  * layer-0 as extracted-patches matmul: conv(3ch in) runs the MXU at
    3/128 lane utilization; conv_general_dilated_patches -> (5*5*3=75)-ch
    1x1 contraction lifts it to 75/128 (2 GF but potentially many ms).
  * blurpool cost: depthwise binomial conv, VPU-bound.

Usage: python scripts/perf_delta_breakdown.py [--frames 8 --dtype bfloat16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fence(out):
    import jax
    leaf = jax.tree.leaves(out)[0]
    return float(leaf.reshape(-1)[0])


def timeit(fn, reps=5):
    import jax
    out = fn()
    fence(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    fence(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--h", type=int, default=476)
    ap.add_argument("--w", type=int, default=854)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dino_tracker_tpu.models import delta_dino as dd
    from dino_tracker_tpu.models import nn

    cdtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.random(
        (args.frames, 3, args.h, args.w), dtype=np.float32))
    params, stats = dd.init_delta_dino(jax.random.PRNGKey(0))
    vit_hw = (1 + (args.h - 14) // 7, 1 + (args.w - 14) // 7)

    results = {}

    # full apply fwd / grad
    def full_fwd():
        f = jax.jit(lambda p, s, fr: dd.apply_delta_dino(
            p, s, fr, vit_hw, train=True, compute_dtype=cdtype)[0])
        return lambda: f(params, stats, frames)

    def full_grad():
        def loss(p, s, fr):
            r, _ = dd.apply_delta_dino(p, s, fr, vit_hw, train=True,
                                       compute_dtype=cdtype)
            return jnp.sum(r * r) * 1e-6
        f = jax.jit(jax.grad(loss))
        return lambda: f(params, stats, frames)

    results["full_fwd_ms"] = timeit(full_fwd(), args.reps) * 1e3
    results["full_grad_ms"] = timeit(full_grad(), args.reps) * 1e3

    # truncated stacks: layers 0..k (conv+bn+relu+blurpool as in apply)
    def stack_k(k):
        @jax.jit
        def f(p, s, fr):
            x = nn.nchw_to_nhwc(fr)
            for i in range(k + 1):
                layer, st = p["layers"][i], s["layers"][i]
                is_last = i == len(p["layers"]) - 1
                dilation = dd.DILATIONS[i]
                padding = (dd.KERNEL_SIZE
                           + (dd.KERNEL_SIZE - 1) * (dilation - 1)) // 2
                x = nn.conv2d(x.astype(cdtype), layer["conv"], stride=1,
                              dilation=dilation, padding=padding,
                              padding_mode="reflect")
                x, _ = nn.batchnorm(x, layer["bn"], st, train=True)
                if not is_last:
                    x = jax.nn.relu(x)
                if dd.DOWNSAMPLE[i]:
                    x = nn.blurpool(x, stride=dd.DOWN_STRIDE)
            return jnp.sum(x.astype(jnp.float32))
        return lambda: f(params, stats, frames)

    for k in range(4):
        results[f"stack_0..{k}_fwd_ms"] = timeit(stack_k(k), args.reps) * 1e3

    # layer-0 patches formulation (75-channel 1x1 instead of 3-channel 5x5)
    @jax.jit
    def layer0_patches(p, fr):
        x = nn.nchw_to_nhwc(fr).astype(cdtype)
        xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
        pat = jax.lax.conv_general_dilated_patches(
            xp, (5, 5), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))  # N,H,W,75 (c,kh,kw)
        w = p["layers"][0]["conv"]["w"]  # 5,5,3,64 HWIO
        wf = jnp.transpose(w, (2, 0, 1, 3)).reshape(1, 1, 75, 64)
        out = jax.lax.conv_general_dilated(
            pat, wf.astype(cdtype), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(out.astype(jnp.float32))

    results["layer0_patches_fwd_ms"] = timeit(
        lambda: layer0_patches(params, frames), args.reps) * 1e3

    # blurpool alone at layer-1 shape
    x1 = jnp.asarray(rng.random(
        (args.frames, args.h, args.w, 64), dtype=np.float32)).astype(cdtype)

    @jax.jit
    def bp(x):
        return jnp.sum(nn.blurpool(x, stride=2).astype(jnp.float32))

    results["blurpool_l1_fwd_ms"] = timeit(lambda: bp(x1), args.reps) * 1e3

    for k in results:
        results[k] = round(results[k], 2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()

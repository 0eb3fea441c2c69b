"""Component timing for the RAFT pair sweep (the O(T²) preprocessing
dominator). Splits raft_decode cost into:

  * corr-pyramid build (the all-pairs einsum)
  * per-GRU-iteration cost, split into corr-lookup (gathers) vs convs
    (motion encoder + SepConv GRU + flow head)

by timing decode at two iteration counts (per-iter slope) and a variant
with the corr lookup replaced by a constant (conv-only slope).

Usage: python scripts/perf_raft_breakdown.py [--h 476 --w 854 --batch 8]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=3):
    out = fn(*args)  # compile
    import jax
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    # materialize a scalar: on the relay, block_until_ready is not a fence
    import jax.numpy as jnp
    float(jnp.asarray(out[0] if isinstance(out, tuple) else out).ravel()[0])
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=476)
    ap.add_argument("--w", type=int, default=854)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dino_tracker_tpu.models import raft

    rng = np.random.default_rng(0)
    params = raft.init_raft(jax.random.PRNGKey(0))
    padder = raft.InputPadder((args.h, args.w))
    imgs = jnp.asarray(padder.pad(jnp.asarray(
        rng.random((args.batch, 3, args.h, args.w), dtype=np.float32))))

    cdtype = jnp.dtype(args.dtype)
    enc = jax.jit(functools.partial(raft.raft_encode, compute_dtype=cdtype))
    t_enc = timeit(lambda x: enc(params, x), imgs, reps=args.reps)
    fmap, net, inp = enc(params, imgs)
    fmap2 = jnp.roll(fmap, 1, axis=0)

    results = {"encode_s_per_frame": t_enc / args.batch}

    def decode_n(n):
        f = jax.jit(functools.partial(raft.raft_decode, num_iters=n))
        return timeit(lambda: f(params, fmap, fmap2, net, inp),
                      reps=args.reps)

    t24, t4 = decode_n(24), decode_n(4)
    per_iter = (t24 - t4) / 20.0
    fixed = t4 - 4 * per_iter  # pyramid build + upsample + dispatch
    results.update({
        "decode24_s_per_pair": t24 / args.batch,
        "decode_per_iter_s_per_pair": per_iter / args.batch,
        "decode_fixed_s_per_pair": fixed / args.batch,
    })

    # NOTE: a monkeypatched-lookup "convs only" variant is NOT measurable
    # here — raft_decode's inner jit cache keeps the originally traced
    # lookup. Use a jax.profiler trace + hlo_stats for the op-level split
    # (that is how the scalar-gather lookup was identified as ~95% of
    # decode time before the patch-slice reformulation).

    for k, v in results.items():
        results[k] = round(v, 5)
    results["sweep_minutes_T50"] = round(
        (2 * 49 + 2 * 1225) * results["decode24_s_per_pair"] / 60, 2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()

"""On-TPU flash-attention numerics + speed check (automated, not a one-off).

Runs the Pallas flash-attention kernel on the REAL device (CI only ever
exercises interpret mode on CPU — tests/test_vit.py) against XLA attention
at the extraction workload's sequence length (8107 tokens for 854×476 at
stride 7, padded to 8192) and asserts numerical agreement <= --max-err.

Part of the verify/perf path: run whenever the kernel or the attention
dispatch changes, record the printed JSON in PERF.md.

    python scripts/perf_flash_attention.py [--seq 8192] [--max-err 1e-3]
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=8192)
    ap.add_argument("--valid", type=int, default=8108,
                    help="valid length incl. cls (854x476 @ stride 7)")
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--head-dim", type=int, default=64)
    ap.add_argument("--max-err", type=float, default=1e-3)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from dino_tracker_tpu.ops import attention as attn_ops
    from dino_tracker_tpu.ops.flash_attention import flash_attention

    platform = jax.devices()[0].platform
    b, h, s, d = 1, args.heads, args.seq, args.head_dim
    valid = min(args.valid, s)
    scale = 1.0 / math.sqrt(d)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b * h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b * h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b * h, s, d)).astype(np.float32))

    flash = jax.jit(lambda q, k, v: flash_attention(
        q, k, v, sm_scale=scale, valid_len=valid))
    xla = jax.jit(lambda q, k, v: attn_ops.xla_attention(
        q.reshape(b, h, s, d)[:, :, :valid],
        k.reshape(b, h, s, d)[:, :, :valid],
        v.reshape(b, h, s, d)[:, :, :valid], sm_scale=scale))

    def timed(fn, *xs):
        out = fn(*xs)
        float(out.reshape(-1)[0])  # host fence (block_until_ready unreliable
        t0 = time.time()           # on the axon relay platform)
        for _ in range(args.iters):
            out = fn(*xs)
        float(out.reshape(-1)[0])
        return out, (time.time() - t0) / args.iters

    out_flash, dt_flash = timed(flash, q, k, v)
    out_xla, dt_xla = timed(xla, q, k, v)

    a = np.asarray(out_flash)[:, :valid]
    bref = np.asarray(out_xla).reshape(b * h, valid, d)
    err = float(np.abs(a - bref).max())
    ok = err <= args.max_err
    print(json.dumps({
        "check": "flash_attention_on_device",
        "platform": platform,
        "seq": s, "valid": valid, "heads": h, "head_dim": d,
        "max_abs_err": err, "threshold": args.max_err, "pass": ok,
        "ms_flash": round(dt_flash * 1e3, 2),
        "ms_xla": round(dt_xla * 1e3, 2),
        "speedup": round(dt_xla / dt_flash, 2),
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

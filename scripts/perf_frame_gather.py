"""Microbench: per-iteration frame-set gather from the resident feature video.

The r4 device trace attributed 5.7 ms/iter to ``dino_embed[frames_set]``
(tracker.py:75): XLA materializes a channel-split copy of the FULL
[50,1024,67,121] f32 stack (1.66 GB read+write) before gathering 8 frames
(265 MB). Speed of light for the gather alone is ~0.7 ms. This probes
formulations inside a scan body (mirroring the fused train step):

  fancy   : x[idx]                       (current)
  take2d  : reshape [T, C*h*w] -> take rows -> reshape back
  onehot  : einsum('st,tf->sf') with a one-hot [8,50] matrix
  dslice  : vmap'd lax.dynamic_slice_in_dim per frame

    python scripts/perf_frame_gather.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

T, C, H, W = 50, 1024, 67, 121
S = 8
STEPS = 25


def run(name, body):
    x = jnp.zeros((T, C, H, W), jnp.float32)

    @jax.jit
    def prog(x, keys):
        def one(carry, k):
            idx = jax.random.randint(k, (S,), 0, T)
            g = body(x, idx)
            return carry + jnp.sum(g * g), None
        tot, _ = jax.lax.scan(one, jnp.asarray(0.0, jnp.float32), keys)
        return tot

    keys = jax.random.split(jax.random.PRNGKey(0), STEPS)
    prog(x, keys).block_until_ready()  # compile
    reps = 3
    t0 = time.monotonic()
    for _ in range(reps):
        prog(x, keys).block_until_ready()
    dt = (time.monotonic() - t0) / reps / STEPS * 1000
    print(f"  {name:8s} {dt:7.2f} ms/iter")
    return dt


def main():
    print(f"gather [{T},{C},{H},{W}] f32 -> {S} frames, in a {STEPS}-step scan")
    run("fancy", lambda x, idx: x[idx])
    run("take2d", lambda x, idx: jnp.take(
        x.reshape(T, C * H * W), idx, axis=0).reshape(S, C, H, W))
    run("onehot", lambda x, idx: jnp.einsum(
        "st,tf->sf", (idx[:, None] == jnp.arange(T)[None, :]).astype(jnp.float32),
        x.reshape(T, C * H * W), preferred_element_type=jnp.float32
    ).reshape(S, C, H, W))
    run("dslice", lambda x, idx: jax.vmap(
        lambda i: jax.lax.dynamic_index_in_dim(x, i, axis=0, keepdims=False)
    )(idx))


if __name__ == "__main__":
    main()

"""Prototype: Pallas blurpool (binomial filt=4, stride=2, reflect pad) as two
1-D stencil passes, vs the production banded-matmul form.

The r5 device trace charges the train step ~7.9 ms/iter for the blurpool
einsums (fwd+bwd): the dense banded form burns ~30x the stencil FLOPs to
stay on the MXU. A stencil pass reads each element once and writes the
half-res output — roofline ~1.2 ms for the L1 shape fwd. This prototype
validates numerics on CPU (interpret mode) and times the TPU kernel.

    python scripts/proto_blurpool_pallas.py [--cpu]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_kernels():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    A = (1.0 / 8.0, 3.0 / 8.0, 3.0 / 8.0, 1.0 / 8.0)  # binomial/8, exact

    # ---------------- forward H pass ----------------
    # x: [N, H, W, C] -> y: [N, Ho, W, C], Ho = ceil(H/2)
    # y[o] = a0 x[2o-1] + a1 x[2o] + a2 x[2o+1] + a3 x[2o+2]
    # reflect: row -1 -> 1; rows H, H+1 -> H-2, H-3 (np 'reflect')
    def _leading_taps(x, h: int):
        """Four [ho]-row stencil taps along the LEADING axis via even/odd
        de-interleave: reshape [h, ...] -> [h//2, 2, ...] (minor tiled dims
        untouched — Mosaic-legal), then stride-1 slices + reflect-edge
        concats. Mosaic supports neither >2-D gathers nor stride-2 slices;
        this expresses the same taps with reshape+slice+concat only."""
        ho = (h + 1) // 2
        rest = x.shape[1:]
        if h % 2 == 0:
            pairs = x.reshape(h // 2, 2, *rest)
            even = pairs[:, 0]   # rows 0,2,...,h-2  [ho]
            odd = pairs[:, 1]    # rows 1,3,...,h-1  [ho]
            # t0[o]=x[2o]=even; t1[o]=x[2o+1]=odd
            # tm1[o]=x[2o-1]: odd[o-1], o=0 reflects to x[1]=odd[0]
            tm1 = jnp.concatenate([odd[0:1], odd[:ho - 1]], axis=0)
            # t2[o]=x[2o+2]: even[o+1], o=ho-1 reflects x[h] -> x[h-2]=even[ho-1]
            t2 = jnp.concatenate([even[1:], even[ho - 1:ho]], axis=0)
            return tm1, even, odd, t2
        m = h // 2  # odd h: ho = m+1
        pairs = x[:h - 1].reshape(m, 2, *rest)
        even = jnp.concatenate([pairs[:, 0], x[h - 1:h]], axis=0)  # [ho]
        odd = pairs[:, 1]                                          # [m]
        t0 = even
        # t1[o]=x[2o+1]: odd[o] for o<m; o=m: x[h] -> reflect x[h-2]=odd[m-1]
        t1 = jnp.concatenate([odd, odd[m - 1:m]], axis=0)
        tm1 = jnp.concatenate([odd[0:1], odd], axis=0)
        # t2[o]=x[2o+2]: even[o+1] for o<m; o=m: x[h+1] -> x[h-3]=even[m-1]
        t2 = jnp.concatenate([even[1:], even[m - 1:m]], axis=0)
        return tm1, t0, t1, t2

    def _h_kernel(x_ref, o_ref, *, h: int):
        x = x_ref[0]  # [H, Wt, Ct]
        tm1, t0, t1, t2 = _leading_taps(x, h)
        acc = (A[0] * tm1.astype(jnp.float32)
               + A[1] * t0.astype(jnp.float32)
               + A[2] * t1.astype(jnp.float32)
               + A[3] * t2.astype(jnp.float32))
        o_ref[0] = acc.astype(o_ref.dtype)

    def blur_h(x, interpret=False):
        n, h, w, c = x.shape
        ho = (h + 1) // 2
        wt = min(w, 128 if c >= 128 else 256)
        ct = min(c, 128)
        grid = (n, w // wt if w % wt == 0 else -(-w // wt),
                -(-c // ct))
        return pl.pallas_call(
            functools.partial(_h_kernel, h=h),
            grid=grid,
            in_specs=[pl.BlockSpec((1, h, wt, ct),
                                   lambda i, j, k: (i, 0, j, k))],
            out_specs=pl.BlockSpec((1, ho, wt, ct),
                                   lambda i, j, k: (i, 0, j, k)),
            out_shape=jax.ShapeDtypeStruct((n, ho, w, c), x.dtype),
            interpret=interpret,
        )(x)

    def blurpool2(x, interpret=False):
        # W pass = H pass on the (n, w, h, c) transpose: Mosaic supports the
        # leading-axis de-interleave but neither strided slices nor sublane
        # reshapes, and the two XLA transposes keep C on the lane axis
        # (a cheap sublane permute) — measured vs in-kernel alternatives.
        y = blur_h(x, interpret)
        y = jnp.transpose(y, (0, 2, 1, 3))
        y = blur_h(y, interpret)
        return jnp.transpose(y, (0, 2, 1, 3))

    return blurpool2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from dino_tracker_tpu.models import nn

    blurpool2 = make_kernels()
    interpret = args.cpu

    rng = np.random.default_rng(0)
    # production L1 shape (bf16) but small-first for numerics
    for shape in [(2, 36, 54, 8), (2, 35, 53, 8)]:
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        ref = nn.blurpool(x, stride=2, filt_size=4, impl="matmul")
        got = blurpool2(x, interpret=interpret)
        err = float(jnp.max(jnp.abs(ref - got)))
        print(f"shape {shape}: max err vs matmul = {err:.2e}")
        assert err < 1e-5, "numerics mismatch"

    if args.cpu:
        print("CPU interpret-mode numerics OK")
        return

    # TPU timing at the three production shapes
    def fence(o):
        return float(o.reshape(-1)[0])

    for shape in [(8, 476, 854, 64), (8, 238, 427, 128), (8, 119, 214, 256)]:
        x = jnp.asarray(rng.standard_normal(shape), np.float32).astype(
            jnp.bfloat16)
        f_new = jax.jit(lambda x: blurpool2(x))
        f_mm = jax.jit(lambda x: nn.blurpool(x, impl="matmul"))
        f_cv = jax.jit(lambda x: nn.blurpool(x, impl="conv"))
        out = {}
        for name, f in [("pallas", f_new), ("matmul", f_mm), ("conv", f_cv)]:
            o = f(x); fence(o)
            t0 = time.perf_counter()
            for _ in range(10):
                o = f(x)
            fence(o)
            out[name] = (time.perf_counter() - t0) / 10 * 1e3
        print(shape, {k: round(v, 3) for k, v in out.items()})


if __name__ == "__main__":
    main()

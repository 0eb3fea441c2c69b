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
    def _h_kernel(x_ref, o_ref, *, h: int):
        x = x_ref[0]  # [H, Wt, Ct]
        ho = o_ref.shape[1]
        # interior via strided slices (rows 1..2ho-2 exist for o>=1)
        # build the four taps as [Ho, Wt, Ct] stacks with edge clamping
        def tap(off):
            # input row index per o: r = 2o + off, off in {-1,0,1,2}
            # gather via one strided slice where possible + edge fixes
            idx = jnp.arange(ho) * 2 + off
            idx = jnp.where(idx < 0, -idx, idx)
            idx = jnp.where(idx >= h, 2 * h - 2 - idx, idx)
            return x[idx]
        acc = (A[0] * tap(-1).astype(jnp.float32)
               + A[1] * tap(0).astype(jnp.float32)
               + A[2] * tap(1).astype(jnp.float32)
               + A[3] * tap(2).astype(jnp.float32))
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

    # ---------------- forward W pass ----------------
    def _w_kernel(x_ref, o_ref, *, w: int):
        x = x_ref[0]  # [Ht, W, Ct]
        wo = o_ref.shape[2]
        def tap(off):
            idx = jnp.arange(wo) * 2 + off
            idx = jnp.where(idx < 0, -idx, idx)
            idx = jnp.where(idx >= w, 2 * w - 2 - idx, idx)
            return x[:, idx]
        acc = (A[0] * tap(-1).astype(jnp.float32)
               + A[1] * tap(0).astype(jnp.float32)
               + A[2] * tap(1).astype(jnp.float32)
               + A[3] * tap(2).astype(jnp.float32))
        o_ref[0] = acc.astype(o_ref.dtype)

    def blur_w(x, interpret=False):
        n, h, w, c = x.shape
        wo = (w + 1) // 2
        ht = min(h, 16)
        ct = min(c, 128)
        grid = (n, -(-h // ht), -(-c // ct))
        return pl.pallas_call(
            functools.partial(_w_kernel, w=w),
            grid=grid,
            in_specs=[pl.BlockSpec((1, ht, w, ct),
                                   lambda i, j, k: (i, j, 0, k))],
            out_specs=pl.BlockSpec((1, ht, wo, ct),
                                   lambda i, j, k: (i, j, 0, k)),
            out_shape=jax.ShapeDtypeStruct((n, h, wo, c), x.dtype),
            interpret=interpret,
        )(x)

    def blurpool2(x, interpret=False):
        return blur_w(blur_h(x, interpret), interpret)

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

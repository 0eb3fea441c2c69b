"""Isolate the raft_decode composition gap (VERDICT r2 item 2).

PERF r2: isolated decode components (corr lookup, convs) sum to ~15 ms per
GRU iteration at batch 8 / 476x854, but the composed loop measures ~31 ms.
This probe re-measures the slopes with purpose-built scan variants compiled
as SEPARATE jitted programs (monkeypatching inside raft_decode is defeated
by its jit cache):

  * composed        — the production decode (24 vs 4 iter slope)
  * lookup_only     — scan body = corr_lookup + epsilon consume
  * convs_only      — scan body = motion encoder + GRU + flow head, corr
                      synthesized from the carry (no lookup)
  * no_combine      — composed, but the bilinear one-hot matmul replaced by
                      a cheap slice-consume of the raw patches (isolates the
                      (N,10,10) -> matmul relayout cost inside the loop)

Usage: python scripts/perf_decode_probe.py [--h 476 --w 854 --batch 8]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, reps=3):
    """Median of per-call times (the relay shows multi-minute transient
    degradations — a mean over reps is worthless when one rep is hit)."""
    import jax
    import jax.numpy as jnp

    def fence(out):
        float(jnp.asarray(
            out[0] if isinstance(out, tuple) else out).ravel()[0])

    out = fn()  # compile + first-run warmup
    fence(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        fence(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=476)
    ap.add_argument("--w", type=int, default=854)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--iters", type=int, nargs=2, default=(24, 4))
    ap.add_argument("--variants", nargs="*", default=[
        "composed", "lookup_only", "convs_only", "no_combine"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dino_tracker_tpu.models import raft
    from dino_tracker_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    params = raft.init_raft(jax.random.PRNGKey(0))
    padder = raft.InputPadder((args.h, args.w))
    imgs = jnp.asarray(padder.pad(jnp.asarray(
        rng.random((args.batch, 3, args.h, args.w), dtype=np.float32))))
    fmap, net, inp = raft.raft_encode(params, imgs)
    fmap2 = jnp.roll(fmap, 1, axis=0)
    b, h8, w8, _ = fmap.shape
    coords0 = raft._coords_grid(b, h8, w8)

    hi, lo = args.iters
    results = {}

    def slope(name, fn_of_n):
        print(f"[{name}] hi={hi} ...", file=sys.stderr, flush=True)
        t_hi = timeit(fn_of_n(hi), reps=args.reps)
        print(f"[{name}] hi={hi}: {t_hi*1e3:.1f} ms", file=sys.stderr,
              flush=True)
        t_lo = timeit(fn_of_n(lo), reps=args.reps)
        print(f"[{name}] lo={lo}: {t_lo*1e3:.1f} ms", file=sys.stderr,
              flush=True)
        return (t_hi - t_lo) / (hi - lo)

    # --- composed (production) -------------------------------------------
    def composed(n):
        f = jax.jit(functools.partial(raft.raft_decode, num_iters=n))
        return lambda: f(params, fmap, fmap2, net, inp)

    if "composed" in args.variants:
        results["composed_ms_per_iter"] = slope("composed", composed) * 1e3

    # --- lookup only ------------------------------------------------------
    # eager (NOT jitted): the (hl, wl) entries must stay Python ints
    need_pyr = {"lookup_only", "no_combine"} & set(args.variants)
    pyramid = None
    if need_pyr:
        print("building padded pyramid ...", file=sys.stderr, flush=True)
        pyramid = raft.pad_pyramid_for_lookup(
            raft.build_corr_pyramid(fmap, fmap2))
        jax.block_until_ready([e[0] for e in pyramid])
        print("pyramid ready", file=sys.stderr, flush=True)

    def _split_pyramid(pyr):
        """Split [(vol, (hl, wl), padded)] into (vols tuple — traced jit
        args) and (meta tuple — static closure): closing over the multi-GB
        volumes bakes them into the program as constants (PERF.md rule 5 —
        the relay then ships 5 GB per compile)."""
        vols = tuple(e[0] for e in pyr)
        meta = tuple((e[1], e[2]) for e in pyr)
        return vols, meta

    def lookup_only(n):
        vols, meta = _split_pyramid(pyramid)

        @jax.jit
        def run(vols, coords0):
            pyr = [(v, hw, p) for v, (hw, p) in zip(vols, meta)]

            def step(coords1, _):
                corr = raft.corr_lookup(pyr, coords1)
                # consume into the carry so nothing is DCE'd
                delta = jnp.mean(corr, axis=-1)[:, None] * 1e-12
                return coords1 + delta, None
            out, _ = jax.lax.scan(step, coords0, None, length=n, unroll=2)
            return out
        return lambda: run(vols, coords0)

    if "lookup_only" in args.variants:
        results["lookup_only_ms_per_iter"] = slope(
            "lookup_only", lookup_only) * 1e3

    # --- convs only -------------------------------------------------------
    def convs_only(n):
        up = params["update"]

        @jax.jit
        def run(net, inp, coords0):
            cdtype = net.dtype

            def step(carry, _):
                net, coords1 = carry
                flow = jnp.transpose(coords1 - coords0, (0, 2, 3, 1))
                corr = jnp.broadcast_to(
                    flow[..., :1], flow.shape[:3] + (324,))
                motion = raft._motion_encoder(up["enc"], flow.astype(cdtype),
                                              corr.astype(cdtype))
                new_net = raft._sep_conv_gru(
                    up["gru"], net, jnp.concatenate([inp, motion], axis=-1))
                delta = raft._flow_head(
                    up["flow_head"], new_net).astype(jnp.float32)
                coords1 = coords1 + jnp.transpose(delta, (0, 3, 1, 2))
                return (new_net, coords1), None

            (net, coords1), _ = jax.lax.scan(step, (net, coords0), None,
                                             length=n, unroll=2)
            return coords1
        return lambda: run(net, inp, coords0)

    if "convs_only" in args.variants:
        results["convs_only_ms_per_iter"] = slope(
            "convs_only", convs_only) * 1e3

    # --- composed with the bilinear combine matmul removed ---------------
    def no_combine(n):
        up = params["update"]
        vols, meta = _split_pyramid(pyramid)

        @jax.jit
        def run(vols, net, inp, coords0):
            pyr = [(v, hw, p) for v, (hw, p) in zip(vols, meta)]
            cdtype = net.dtype

            def lookup_raw(coords_b2hw):
                # corr_lookup minus the one-hot matmul: consume the raw
                # (N,10,10) patches with a static slice so the gather,
                # layouts, and scan structure stay identical
                b2, _, h, w = coords_b2hw.shape
                coords = jnp.transpose(coords_b2hw, (0, 2, 3, 1))
                r = raft.CORR_RADIUS
                side = 2 * r + 2
                outs = []
                for lvl, entry in enumerate(pyr):
                    vol, (hl, wl), _ = entry
                    c = coords.reshape(-1, 2) / (2 ** lvl)
                    cx = jnp.clip(c[:, 0], -(r + 1.0), wl - 1 + r + 1.0)
                    cy = jnp.clip(c[:, 1], -(r + 1.0), hl - 1 + r + 1.0)
                    x0 = jnp.floor(cx)
                    y0 = jnp.floor(cy)
                    sx = (x0 - r + 2 * r + 2).astype(jnp.int32)
                    sy = (y0 - r + 2 * r + 2).astype(jnp.int32)
                    patch = raft._window_patches(vol, sy, sx, side)
                    win = patch[:, :9, :9].reshape(b2, h, w, 81)
                    outs.append(win)  # 81 ch/level -> 324 total, like corr
                return jnp.concatenate(outs, axis=-1)

            def step(carry, _):
                net, coords1 = carry
                corr = lookup_raw(coords1)
                flow = jnp.transpose(coords1 - coords0, (0, 2, 3, 1))
                motion = raft._motion_encoder(up["enc"], flow.astype(cdtype),
                                              corr.astype(cdtype))
                new_net = raft._sep_conv_gru(
                    up["gru"], net, jnp.concatenate([inp, motion], axis=-1))
                delta = raft._flow_head(
                    up["flow_head"], new_net).astype(jnp.float32)
                coords1 = coords1 + jnp.transpose(delta, (0, 3, 1, 2))
                return (new_net, coords1), None

            (net, coords1), _ = jax.lax.scan(step, (net, coords0), None,
                                             length=n, unroll=2)
            return coords1
        return lambda: run(vols, net, inp, coords0)

    if "no_combine" in args.variants:
        results["no_combine_ms_per_iter"] = slope(
            "no_combine", no_combine) * 1e3

    if ("lookup_only_ms_per_iter" in results
            and "convs_only_ms_per_iter" in results):
        results["sum_isolated_ms"] = (results["lookup_only_ms_per_iter"]
                                      + results["convs_only_ms_per_iter"])
    for k in results:
        results[k] = round(results[k], 2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()

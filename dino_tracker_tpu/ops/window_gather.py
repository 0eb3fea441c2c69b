"""Pallas per-row window gather: out[n] = vol[n, sy[n]:sy[n]+S, sx[n]:sx[n]+S].

The RAFT correlation-pyramid lookup needs one small (S×S, S=10) patch per
source pixel from that pixel's own correlation map (reference RAFT lookup;
our models/raft.py corr_lookup). XLA lowers the per-row dynamic-window
gather to a serial scalar/slice loop that measures ~1 GiB/s on TPU v5e —
the single dominant cost of the whole O(T²) direct-flow sweep (95% of
raft_decode wall clock before this kernel).

Kernel shape: HBM lane-dim (last-axis) DMA slices must be 128-aligned on
TPU, so each row's transfer is a full-width S-row strip
``vol[n, sy:sy+S, :]`` (dim-1 offsets are unrestricted — sublane tile is 1)
streamed HBM→VMEM with ``DEPTH`` copies in flight; the x-window is then cut
in-register with a dynamic lane rotate (``pltpu.roll``) + static slice.
Window starts arrive per block through SMEM.

Out-of-range semantics are the caller's job: ``vol`` must already be padded
so every (sy, sx) window is in bounds (models/raft.py pads by 2r+2 and
clamps the centroid just past the all-outside boundary, which preserves
grid_sample zeros-padding semantics exactly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEPTH = 32  # DMA strips in flight — each strip is only ~5-10 KB, so many
# must be outstanding to cover HBM latency (8 in flight measured ~110 GB/s
# effective; the target is several hundred)


def _window_gather_kernel(sy_ref, sx_ref, vol_ref, out_ref, scratch, sems,
                          *, block: int, side: int, wp: int):
    i = pl.program_id(0)
    base = i * block

    def get_dma(j):
        slot = jax.lax.rem(j, DEPTH)
        return pltpu.make_async_copy(
            vol_ref.at[base + j, pl.ds(sy_ref[base + j], side), :],
            scratch.at[slot, pl.ds(0, side), :],
            sems.at[slot],
        )

    def warm(j, carry):
        get_dma(j).start()
        return carry

    # warm only min(DEPTH, block) slots: with block < DEPTH the extra DMAs
    # would read rows past the padded arrays and leave their semaphores
    # unwaited at the end of every grid step (UB/hang on real TPU)
    jax.lax.fori_loop(0, min(DEPTH, block), warm, None)

    def body(j, carry):
        # wait first: slot j%DEPTH must drain before j+DEPTH reuses it
        get_dma(j).wait()
        strip = scratch[jax.lax.rem(j, DEPTH)]  # sublane-padded side×wp
        # dynamic lane rotate needs (8k, 128m)-aligned vectors — scratch is
        # sized for that; bring lanes [sx, sx+side) to the front
        rolled = pltpu.roll(strip, wp - sx_ref[base + j], axis=1)
        out_ref[j] = rolled[:side, :side]

        @pl.when(j + DEPTH < block)
        def _():
            get_dma(j + DEPTH).start()
        return carry

    jax.lax.fori_loop(0, block, body, None)


BLOCK = 256  # rows per grid step (callers pre-padding the volume row axis
# to a BLOCK multiple skip the in-wrapper row pad)

# The sy/sx scalar-prefetch arrays live whole in SMEM (1 MB); cap the rows
# per pallas_call so 2 int32 arrays never exceed ~900 KB and chunk above it.
_MAX_ROWS = 114_688


@functools.partial(jax.jit,
                   static_argnames=("side", "block", "interpret"))
def window_gather(vol, sy, sx, side: int = 10, block: int = BLOCK,
                  interpret: bool = False):
    """vol: (≥N, Hp, Wp); sy/sx: (N,) int32 window starts (must be in
    bounds: 0 ≤ s ≤ dim - side, and sx + side ≤ 128·ceil(Wp/128)).
    Returns (N, side, side) patches. Wp is lane-padded to a 128 multiple
    and rows to a block multiple internally (per-row strip DMAs must be
    full-width and lane-aligned) — callers on the hot path pre-pad the
    volume to the final layout so these pads compile away
    (models/raft.py corr_lookup)."""
    n = sy.shape[0]
    nv, hp, wp = vol.shape
    n_pad = -(-n // block) * block
    wp_pad = -(-wp // 128) * 128
    if wp_pad != wp:
        vol = jnp.pad(vol, ((0, 0), (0, 0), (0, wp_pad - wp)))
        wp = wp_pad
    if nv < n_pad:
        vol = jnp.pad(vol, ((0, n_pad - nv), (0, 0), (0, 0)))
    if n_pad != n:
        sy = jnp.pad(sy, (0, n_pad - n))
        sx = jnp.pad(sx, (0, n_pad - n))

    max_rows = (_MAX_ROWS // block) * block

    def call(vol_c, sy_c, sx_c, rows):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # sy, sx whole-array in SMEM
            grid=(rows // block,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # vol stays in HBM
            ],
            out_specs=pl.BlockSpec((block, side, side),
                                   lambda i, sy, sx: (i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((DEPTH, -(-side // 8) * 8, wp), vol_c.dtype),
                pltpu.SemaphoreType.DMA((DEPTH,)),
            ],
        )
        return pl.pallas_call(
            functools.partial(_window_gather_kernel, block=block, side=side,
                              wp=wp),
            out_shape=jax.ShapeDtypeStruct((rows, side, side), vol_c.dtype),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(sy_c, sx_c, vol_c)

    if n_pad <= max_rows:
        return call(vol[:n_pad], sy, sx, n_pad)[:n]
    chunks = []
    for s in range(0, n_pad, max_rows):
        e = min(s + max_rows, n_pad)
        chunks.append(call(vol[s:e], sy[s:e], sx[s:e], e - s))
    return jnp.concatenate(chunks, axis=0)[:n]


def window_gather_reference(vol, sy, sx, side: int = 10):
    """vmapped dynamic-slice formulation (XLA fallback / parity oracle)."""
    return jax.vmap(
        lambda v, y, x: jax.lax.dynamic_slice(v, (y, x), (side, side))
    )(vol, sy, sx)

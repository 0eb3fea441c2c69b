"""Pallas flash attention (forward) for the ViT feature extractor.

The stride-7 overlapping-patch ViT runs 8108 tokens/frame through 24 ViT-L
blocks — the (S×S) score matrix would be 263 MB/head in f32, so attention is
the extraction bottleneck. This kernel tiles Q×KV with an online softmax so
scores never leave VMEM (the standard flash schedule), non-causal, with a
key-padding mask so callers can pad S up to a block multiple.

Feature extraction is inference-only (DeltaDINO is the only trained module),
so only the forward kernel is needed; ``attention()`` in ops/attention.py
routes to an XLA fallback on non-TPU backends and for the (tiny) training-
time attention uses nothing at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref,
                      m_scratch, l_scratch, acc_scratch,
                      *, sm_scale: float, block_k: int, kv_len: int,
                      valid_len: int):
    """One (batch·head, q_tile, kv_tile) cell. Shapes per tile:
    q: [block_q, d], k/v: [block_k_major, d], o: [block_q, d]."""
    kv_idx = pl.program_id(2)
    block_k_major = k_ref.shape[1]

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]

    def body(start_k, _):
        k = k_ref[0, pl.ds(start_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * sm_scale
        # key-padding mask: keys >= valid_len contribute nothing
        col = (kv_idx * block_k_major + start_k
               + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1))
        s = jnp.where(col < valid_len, s, DEFAULT_MASK_VALUE)

        m_prev = m_scratch[...]
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)  # [bq, 1]
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_corr = alpha * l_prev
        l_next = l_corr + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_prev.shape)
        m_scratch[...] = m_next
        l_scratch[...] = l_next

        v = v_ref[0, pl.ds(start_k, block_k), :]
        acc_scratch[...] *= alpha[:, :1]
        acc_scratch[...] += jax.lax.dot(p.astype(v.dtype), v,
                                        preferred_element_type=jnp.float32)
        return ()

    jax.lax.fori_loop(0, block_k_major // block_k,
                      lambda i, c: body(i * block_k, c), ())

    @pl.when(kv_idx == (kv_len // block_k_major) - 1)
    def _store():
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_q",
                                             "block_k_major", "block_k",
                                             "valid_len", "interpret"))
def flash_attention(q, k, v, sm_scale: float, valid_len: int = None,
                    block_q: int = 512, block_k_major: int = 512,
                    block_k: int = 512, interpret: bool = False):
    """Non-causal flash attention. q/k/v: [BH, S, d] (batch·heads flattened),
    S padded to a multiple of the block sizes; ``valid_len`` masks padded
    keys. Returns [BH, S, d] (rows ≥ valid_len are garbage)."""
    bh, s, d = q.shape
    if valid_len is None:
        valid_len = s
    assert s % block_q == 0 and s % block_k_major == 0
    assert block_k_major % block_k == 0

    grid = (bh, s // block_q, s // block_k_major)
    kernel = functools.partial(_flash_fwd_kernel, sm_scale=sm_scale,
                               block_k=block_k, kv_len=s,
                               valid_len=valid_len)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k_major, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k_major, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q, k, v)

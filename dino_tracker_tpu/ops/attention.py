"""Multi-head attention dispatch: Pallas flash kernel on TPU, XLA fallback.

The XLA path is the semantic reference (plain softmax attention); the Pallas
path must match it to float tolerance (tested in tests/test_vit.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .flash_attention import flash_attention


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def xla_attention(q, k, v, sm_scale: float):
    """q/k/v: [B, H, S, d] -> [B, H, S, d]."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def multi_head_attention(q, k, v, sm_scale: float, impl: str = "auto",
                         interpret: bool = False):
    """q/k/v: [B, H, S, d]. impl: 'auto' | 'flash' | 'xla'."""
    if impl == "auto":
        impl = "flash" if jax.default_backend() not in ("cpu",) else "xla"
    if impl == "xla":
        return xla_attention(q, k, v, sm_scale)

    b, h, s, d = q.shape
    # 1024 blocks measured fastest at the extraction shape (S=8192, d=64):
    # 24 vs 19 TF/s with 512 blocks; ≥2048 blow VMEM. Softmax VPU work is
    # the kernel's bound, so the win comes from fewer per-tile fixed costs.
    block = 1024 if s >= 1024 else _round_up(s, 128)
    s_pad = _round_up(s, block)
    qf = q.reshape(b * h, s, d)
    kf = k.reshape(b * h, s, d)
    vf = v.reshape(b * h, s, d)
    if s_pad != s:
        pad = ((0, 0), (0, s_pad - s), (0, 0))
        qf, kf, vf = jnp.pad(qf, pad), jnp.pad(kf, pad), jnp.pad(vf, pad)
    out = flash_attention(qf, kf, vf, sm_scale=sm_scale, valid_len=s,
                          block_q=block, block_k_major=block, block_k=block,
                          interpret=interpret)
    return out[:, :s, :].reshape(b, h, s, d)

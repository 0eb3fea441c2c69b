"""Pallas blurpool vs the reference matmul/conv forms — forward and VJP.

Runs the kernels in interpret mode (tests are CPU-only); the TPU path is
the same kernel code compiled by Mosaic. Shapes cover the three DeltaDINO
blurpool sites (even/even, even/odd, odd/even H×W parities) scaled down.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dino_tracker_tpu.models import nn
from dino_tracker_tpu.ops.blurpool import blurpool_pallas


PARITIES = [(16, 24, 8), (16, 27, 8), (15, 24, 8), (15, 27, 16),
            (36, 54, 4)]


@pytest.mark.parametrize("h,w,c", PARITIES)
def test_forward_matches_matmul_form(h, w, c):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
    ref = nn.blurpool(x, stride=2, filt_size=4, impl="matmul")
    got = blurpool_pallas(x, True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize("h,w,c", PARITIES)
def test_forward_matches_conv_form(h, w, c):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, h, w, c)), jnp.float32)
    ref = nn.blurpool(x, stride=2, filt_size=4, impl="conv")
    got = blurpool_pallas(x, True)
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize("h,w,c", [(16, 24, 8), (15, 27, 8), (16, 27, 8)])
def test_vjp_matches_autodiff_of_matmul_form(h, w, c):
    """The op is linear, so grads wrt x must match the matmul form's
    autodiff exactly (up to f32 noise) for a random cotangent-inducing
    scalar loss."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal(
        (2, (h + 1) // 2, (w + 1) // 2, c)), jnp.float32)

    g_ref = jax.grad(lambda x: jnp.sum(
        nn.blurpool(x, impl="matmul") * wgt))(x)
    g_new = jax.grad(lambda x: jnp.sum(blurpool_pallas(x, True) * wgt))(x)
    np.testing.assert_allclose(g_new, g_ref, atol=1e-5)


def test_bf16_io_f32_accumulate():
    rng = np.random.default_rng(3)
    x32 = jnp.asarray(rng.standard_normal((1, 16, 24, 8)), jnp.float32)
    x16 = x32.astype(jnp.bfloat16)
    got = blurpool_pallas(x16, True)
    assert got.dtype == jnp.bfloat16
    ref = nn.blurpool(x32, impl="conv")
    np.testing.assert_allclose(got.astype(jnp.float32), ref, atol=0.05)

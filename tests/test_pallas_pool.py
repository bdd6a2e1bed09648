"""Pallas fused relu+maxpool vs XLA's native relu -> max_pool lowering.

Exactness is required INCLUDING tie-breaking (first window position in
row-major scan order gets the cotangent): inputs are quantized so that
equal-max windows are common, the regime where a tie-unaware backward
diverges from XLA/torch.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from locov_tpu.ops.pallas_pool import relu_maxpool


def _ref(x):
    return nn.max_pool(nn.relu(x), (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)))


def _cases(rng):
    smooth = rng.randn(2, 32, 20, 8).astype(np.float32)
    # heavy ties: few distinct values, many exact repeats
    tied = rng.randint(-2, 3, size=(2, 48, 12, 8)).astype(np.float32)
    # bf16-quantized: adjacent near values collapse to equal bf16
    quant = np.asarray(
        jnp.asarray(rng.randn(1, 16, 64, 16).astype(np.float32) * 1e-2)
        .astype(jnp.bfloat16).astype(jnp.float32))
    return [smooth, tied, quant]


def test_forward_matches_xla(rng):
    for x in _cases(rng):
        got = relu_maxpool(jnp.asarray(x), True)
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(_ref(jnp.asarray(x)),
                                                 np.float32))


def test_backward_matches_xla_with_ties(rng):
    for x in _cases(rng):
        xj = jnp.asarray(x)
        dy = jnp.asarray(
            rng.randn(*_ref(xj).shape).astype(np.float32))

        g1 = jax.grad(lambda t: (relu_maxpool(t, True) * dy).sum())(xj)
        g2 = jax.grad(lambda t: (_ref(t) * dy).sum())(xj)
        # identical tap selection; only multi-contribution summation
        # order may differ -> ulp-level tolerance
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-6, atol=1e-6)


def test_backward_bf16_ties(rng):
    x = jnp.asarray(rng.randint(-2, 3, size=(2, 32, 24, 8))
                    .astype(np.float32)).astype(jnp.bfloat16)
    dy = jnp.asarray(rng.randn(2, 16, 12, 8).astype(np.float32)
                     ).astype(jnp.bfloat16)
    g1 = jax.grad(lambda t: (relu_maxpool(t, True).astype(jnp.float32)
                             * dy.astype(jnp.float32)).sum())(x)
    g2 = jax.grad(lambda t: (_ref(t).astype(jnp.float32)
                             * dy.astype(jnp.float32)).sum())(x)
    # XLA's scatter-add accumulates the up-to-4 window contributions
    # in bf16 (a rounding per add); the kernel accumulates in f32 and
    # rounds once — differences up to a few bf16 ulp are expected and
    # favor the kernel
    np.testing.assert_allclose(np.asarray(g1, np.float32),
                               np.asarray(g2, np.float32),
                               rtol=8e-2, atol=4e-3)


def test_multi_tile_grid(rng):
    # H=64 -> 4 grid tiles of BH=16: exercises halo rows both sides
    x = jnp.asarray(rng.randint(-3, 4, size=(1, 64, 10, 4))
                    .astype(np.float32))
    dy = jnp.asarray(rng.randn(1, 32, 5, 4).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(relu_maxpool(x, True)), np.asarray(_ref(x)))
    g1 = jax.grad(lambda t: (relu_maxpool(t, True) * dy).sum())(x)
    g2 = jax.grad(lambda t: (_ref(t) * dy).sum())(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-6, atol=1e-6)

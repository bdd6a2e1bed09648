"""Golden tests for the Pallas patch-matmul stem conv
(ops/pallas_stem.py) against the plain XLA conv formulation it
replaces. Interpret mode (CPU); the on-device A/B lives in
tools/bench_stem.py and tools/tpu_checks.py."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from locov_tpu.ops import pallas_stem as ps


def _ref(x, w, shift):
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + shift.astype(out.dtype)


@pytest.mark.parametrize("variant", ["bigdot", "nhwc", "cw", "cw4"])
@pytest.mark.parametrize("shape", [(1, 16, 16), (2, 16, 32),
                                   (1, 32, 48)])
def test_stem_conv_matches_xla(shape, variant):
    n, h, w = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, w, 3), jnp.bfloat16)
    wk = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.1, jnp.float32)
    shift = jnp.asarray(rng.randn(64), jnp.float32)

    got = ps.stem_conv_bn(x, wk, shift, variant, True)
    want = _ref(x.astype(jnp.float32), wk, shift)
    assert got.shape == (n, h // 2, w // 2, 64)
    assert got.dtype == jnp.bfloat16
    # both contract the same 147 terms; bf16 inputs, f32 accumulation
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.05)


def test_st4_w2_factorization_exact_f32():
    """The patch contraction (St4 @ W2) equals the conv exactly in
    f32 — checked without the kernel, pinning the repack indexing."""
    rng = np.random.RandomState(1)
    # bf16 input: build_st4's internal bf16 cast is then value-exact,
    # and bf16 values are exactly representable in f32 -> the two f32
    # contractions differ only by summation order
    x = jnp.asarray(rng.randn(1, 16, 16, 3), jnp.bfloat16)
    wk = jnp.asarray(rng.randn(7, 7, 3, 64), jnp.bfloat16)
    st4 = ps.build_st4(x).astype(jnp.float32)  # [1, 11, 64, 8]
    w2 = ps.build_w2(wk).astype(jnp.float32)   # [256, 64]
    out = np.zeros((8, 8, 64), np.float32)
    st = np.asarray(st4[0])
    for r in range(8):
        patch = np.concatenate([st[r + dy] for dy in range(4)], 0)
        out[r] = patch.T @ np.asarray(w2)
    want = _ref(x.astype(jnp.float32), wk.astype(jnp.float32),
                jnp.zeros((64,)))
    np.testing.assert_allclose(out, np.asarray(want[0]), rtol=1e-4,
                               atol=1e-4)


def test_stem_conv_backward_is_conv_vjp():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 16, 16, 3), jnp.float32)
    wk = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.1, jnp.float32)
    shift = jnp.asarray(rng.randn(64), jnp.float32)

    def loss_pallas(x_, w_, s_):
        return jnp.sum(ps.stem_conv_bn(x_, w_, s_, "bigdot", True)
                       .astype(jnp.float32) ** 2) * 1e-3

    def loss_ref(x_, w_, s_):
        return jnp.sum(_ref(x_, w_, s_).astype(jnp.float32) ** 2) * 1e-3

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, wk, shift)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, wk, shift)
    for a, b in zip(gp, gr):
        # cotangents differ only by the fwd's bf16 rounding
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.05, atol=0.3)

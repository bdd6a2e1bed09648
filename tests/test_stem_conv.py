"""conv7x7s2's space-to-depth weight gradient vs jax.grad of the plain
conv (ops/stem_conv.py — identical contraction set, f32 accumulate)."""
import jax
import jax.numpy as jnp
import numpy as np

from locov_tpu.ops.stem_conv import (conv1x1, conv7x7s2,
                                     _conv, _conv1)


def test_stem_conv_grads_match():
    k = jax.random.PRNGKey(0)
    kx, kw, kg = jax.random.split(k, 3)
    x = jax.random.normal(kx, (2, 16, 20, 3))
    w = jax.random.normal(kw, (7, 7, 3, 8)) * 0.1

    out = conv7x7s2(x, w)
    ref = _conv(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss_custom(x, w):
        y = conv7x7s2(x, w)
        return jnp.sum(y * jnp.cos(y.shape[3] + 0.1 * y))

    def loss_ref(x, w):
        y = _conv(x, w)
        return jnp.sum(y * jnp.cos(y.shape[3] + 0.1 * y))

    gx, gw = jax.grad(loss_custom, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-4, atol=1e-4)


def test_conv1x1_grads_match():
    k = jax.random.PRNGKey(1)
    kx, kw = jax.random.split(k)
    x = jax.random.normal(kx, (2, 8, 10, 6))
    w = jax.random.normal(kw, (6, 4)) * 0.1
    for s in (1, 2):
        f = lambda x, w: jnp.sum(jnp.sin(conv1x1(x, w, s)))
        r = lambda x, w: jnp.sum(jnp.sin(_conv1(x, w, s)))
        np.testing.assert_allclose(np.asarray(conv1x1(x, w, s)),
                                   np.asarray(_conv1(x, w, s)),
                                   rtol=1e-5, atol=1e-5)
        gx, gw = jax.grad(f, (0, 1))(x, w)
        rx, rw = jax.grad(r, (0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                                   rtol=1e-5, atol=1e-5)


def test_conv3x3_grads_match():
    """conv3x3's one-matmul patches wgrad vs jax.grad of the plain conv
    at res5-like small-spatial shapes (incl. non-square, C != F)."""
    from locov_tpu.ops.stem_conv import _conv3, conv3x3
    k = jax.random.PRNGKey(2)
    for shape, cf in (((5, 7, 7, 12), (12, 16)), ((3, 4, 6, 8), (8, 8))):
        kx, kw, k = jax.random.split(k, 3)
        x = jax.random.normal(kx, shape)
        w = jax.random.normal(kw, (3, 3) + cf) * 0.1
        np.testing.assert_allclose(np.asarray(conv3x3(x, w)),
                                   np.asarray(_conv3(x, w)),
                                   rtol=1e-5, atol=1e-5)
        f = lambda x, w: jnp.sum(jnp.sin(conv3x3(x, w)))
        r = lambda x, w: jnp.sum(jnp.sin(_conv3(x, w)))
        gx, gw = jax.grad(f, (0, 1))(x, w)
        rx, rw = jax.grad(r, (0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                                   rtol=1e-4, atol=1e-4)

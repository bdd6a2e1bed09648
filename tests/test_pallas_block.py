"""Fused bottleneck-block kernel vs the XLA reference formulation
(ops/pallas_block.py — the round-3 backbone-fusion timebox artifact).

Runs the Pallas kernel in interpret mode on CPU at small shapes; the
on-device parity check at production shapes lives in
tools/bench_block.py (measured rel err 0.0045 at bf16, PERF.md).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from locov_tpu.ops.pallas_block import (BH, bottleneck_block,
                                        bottleneck_block_xla)


@pytest.mark.parametrize("h,w,c,m", [(BH, 16, 128, 64),
                                     (2 * BH, 24, 128, 64)])
def test_block_parity_interpret(h, w, c, m):
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 7)
    n = 2
    x = jax.random.normal(ks[0], (n, h, w, c), jnp.float32)
    w1 = jax.random.normal(ks[1], (c, m)) * 0.05
    b1 = jax.random.normal(ks[2], (m,)) * 0.1
    w2 = jax.random.normal(ks[3], (3, 3, m, m)) * 0.05
    b2 = jax.random.normal(ks[4], (m,)) * 0.1
    w3 = jax.random.normal(ks[5], (m, c)) * 0.05
    b3 = jax.random.normal(ks[6], (c,)) * 0.1
    y_pl = bottleneck_block(x, w1, b1, w2, b2, w3, b3, interpret=True)
    y_xla = bottleneck_block_xla(x, w1, b1, w2, b2, w3, b3)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_xla),
                               rtol=2e-4, atol=2e-4)

#!/usr/bin/env python
"""Device A/B: XLA stem conv (7x7/s2/p3, 3ch) vs the Pallas
patch-matmul stem kernel (ops/pallas_stem.py) at LSM train shapes
([4, 800, 1344, 3] bf16 -> [4, 400, 672, 64]).

Timing protocol for the shared axon chip (PERF.md): chained dependent
iterations with one final scalar materialization, best-of-reps
(jax.block_until_ready does NOT block on axon).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def bench(fn, x, args, n_iter=20, reps=4):
    out = fn(x, *args)
    for _ in range(2):
        out = fn(x, *args)
    float(out.sum())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        xc = x
        for _ in range(n_iter):
            out = fn(xc, *args)
            xc = x + out.reshape(-1)[0] * 0.0
        float(out.sum())
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from locov_tpu.ops import pallas_stem as ps
    from locov_tpu.utils.misc import compile_cache_dir
    jax.config.update("jax_compilation_cache_dir", compile_cache_dir())

    n, h, w = 4, 800, 1344
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, w, 3), jnp.bfloat16)
    wk = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.1, jnp.float32)
    shift = jnp.asarray(rng.randn(64), jnp.float32)

    @jax.jit
    def xla(x_, w_, s_):
        out = jax.lax.conv_general_dilated(
            x_, w_.astype(x_.dtype), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + s_.astype(out.dtype)

    @jax.jit
    def pallas(x_, w_, s_):
        return ps.stem_conv_bn(x_, w_, s_)

    # numerics check on-device first
    a = np.asarray(xla(x, wk, shift), np.float32)
    b = np.asarray(pallas(x, wk, shift), np.float32)
    err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    print(f"max rel err vs XLA: {err:.2e}")

    t_xla = bench(xla, x, (wk, shift))
    t_pal = bench(pallas, x, (wk, shift))
    print(f"XLA conv+shift : {t_xla * 1e3:8.3f} ms")
    print(f"Pallas st4+mm  : {t_pal * 1e3:8.3f} ms  "
          f"({t_xla / t_pal:.2f}x)")

    # fwd+bwd composite (bwd identical by construction; measures the
    # interaction with the VJP's own XLA ops)
    def loss(fn):
        def f(x_, w_, s_):
            return jnp.sum(fn(x_, w_, s_).astype(jnp.float32) ** 2)
        return jax.jit(jax.grad(f, argnums=(0, 1)))

    gx, gp = loss(xla), loss(pallas)

    def bench_grad(g):
        out = g(x, wk, shift)
        float(out[0].sum())
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            xc = x
            for _ in range(20):
                out = g(xc, wk, shift)
                xc = x + out[0].reshape(-1)[0] * 0.0
            float(out[0].sum())
            best = min(best, (time.perf_counter() - t0) / 20)
        return best

    print(f"XLA fwd+bwd    : {bench_grad(gx) * 1e3:8.3f} ms")
    print(f"Pallas fwd+bwd : {bench_grad(gp) * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Timebox bench: fused Pallas bottleneck block vs XLA at res2 train
shapes ([4, 200, 336, 256] bf16). PERF.md backbone frontier item.

Usage: python tools/bench_block.py [--n 4 --h 200 --w 336 --c 256 --m 64]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--h", type=int, default=200)
    ap.add_argument("--w", type=int, default=336)
    ap.add_argument("--c", type=int, default=256)
    ap.add_argument("--m", type=int, default=64)
    ap.add_argument("--check-only", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from locov_tpu.utils.misc import compile_cache_dir
    jax.config.update("jax_compilation_cache_dir", compile_cache_dir())
    from locov_tpu.ops.pallas_block import (bottleneck_block,
                                            bottleneck_block_xla)

    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 7)
    n, h, w, c, m = args.n, args.h, args.w, args.c, args.m
    x = jax.random.normal(ks[0], (n, h, w, c), jnp.bfloat16)
    w1 = jax.random.normal(ks[1], (c, m), jnp.bfloat16) * 0.05
    b1 = jax.random.normal(ks[2], (m,), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[3], (3, 3, m, m), jnp.bfloat16) * 0.05
    b2 = jax.random.normal(ks[4], (m,), jnp.float32) * 0.1
    w3 = jax.random.normal(ks[5], (m, c), jnp.bfloat16) * 0.05
    b3 = jax.random.normal(ks[6], (c,), jnp.float32) * 0.1
    wargs = (w1, b1, w2, b2, w3, b3)

    interpret = jax.default_backend() != "tpu"
    y_pl = bottleneck_block(x, *wargs, interpret=interpret)
    y_xla = jax.jit(bottleneck_block_xla)(x, *wargs)
    err = jnp.max(jnp.abs(y_pl.astype(jnp.float32)
                          - y_xla.astype(jnp.float32)))
    rel = err / jnp.maximum(jnp.max(jnp.abs(y_xla.astype(jnp.float32))),
                            1e-6)
    print(f"max abs err {float(err):.4f} rel {float(rel):.5f}",
          file=sys.stderr)
    if args.check_only:
        print(json.dumps({"metric": "block_parity_max_rel_err",
                          "value": float(rel)}))
        return

    def timeit(fn, reps=3, iters=120):
        y = fn(x, *wargs)
        jax.block_until_ready(y)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            y = x
            for _ in range(iters):
                y = fn(y, *wargs)
            # chained: each iter consumes the previous output so the
            # burst is sequentially dependent (bench.py protocol;
            # block_until_ready alone does not block through the
            # dev tunnel, PERF.md)
            float(jnp.sum(y.astype(jnp.float32)))
            best = min(best, (time.perf_counter() - t0) / iters)
        return best * 1e3

    t_xla = timeit(jax.jit(bottleneck_block_xla))
    t_pl = timeit(lambda *a: bottleneck_block(*a, interpret=interpret))

    # device-only numbers: chain the block inside ONE jitted fori_loop
    # (no per-iteration dispatch through the dev tunnel)
    K = 60

    def looped(fn):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(
                0, K, lambda _, y: fn(y, *wargs), x)

        jax.block_until_ready(run(x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            y = run(x)
            float(jnp.sum(y.astype(jnp.float32)))
            best = min(best, (time.perf_counter() - t0) / K)
        return best * 1e3

    t_xla_dev = looped(bottleneck_block_xla)
    t_pl_dev = looped(
        lambda *a: bottleneck_block(*a, interpret=interpret))
    print(json.dumps({
        "metric": "bottleneck_block_fwd_ms",
        "shape": [n, h, w, c, m],
        "xla_ms": round(t_xla, 3), "pallas_ms": round(t_pl, 3),
        "xla_dev_ms": round(t_xla_dev, 3),
        "pallas_dev_ms": round(t_pl_dev, 3),
        "speedup": round(t_xla_dev / t_pl_dev, 3),
        "max_rel_err": float(rel),
    }))


if __name__ == "__main__":
    main()

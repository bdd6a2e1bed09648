#!/usr/bin/env python
"""Microbench: int8 vs bf16 MXU throughput at res5-eval shapes.

The STT eval floor is res5 on 8000 box crops (~13 TFLOP/step, ~66 ms
at bf16 — PERF.md round-3). The v5e MXU does int8 at 2x the bf16 rate;
if XLA lowers an int8 dot/conv with int32 accumulation to that path,
an opt-in quantized serving mode would be the only remaining eval
lever. This microbench answers the one question that gates building
it: does int8 actually hit the fast path through this JAX/XLA stack?

Shapes: the res5 block-2 conv2 as a GEMM — [8000*4, 3*3*512] x
[3*3*512, 512] class of problem, plus the 1x1s. We time pure dots
(conv-as-GEMM is what XLA emits for 1x1; the 3x3 lowers to implicit
GEMM with the same MXU inner loop).

Timing: fori_loop-chained iterations (the only valid protocol through
the axon tunnel — PERF.md), best-of-4.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from locov_tpu.utils.misc import compile_cache_dir
jax.config.update("jax_compilation_cache_dir", compile_cache_dir())


def timed(fn, x, iters=50, reps=4):
    f = jax.jit(fn)
    y = f(x)
    y.block_until_ready()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        y = f(x)
        float(jnp.asarray(y).ravel()[0].astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def chain_dot(w, iters, out_dt, acc_dt):
    """x -> iters chained dots (each output feeds the next input) so
    device time = iters * one dot, one final fetch."""
    def fn(x):
        def body(i, x):
            y = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dt)
            # renormalize + cast back to the input dtype to keep the
            # chain numerically alive and shape/dtype-stable
            return (y >> 7).astype(x.dtype) if acc_dt == jnp.int32 \
                else y.astype(x.dtype)
        return jax.lax.fori_loop(0, iters, body, x)
    return fn


def main():
    print("devices:", jax.devices())
    rng = np.random.RandomState(0)
    M, K, N = 32768, 512, 512  # square-ish GEMM, res5-class K/N
    iters = 50
    flops = 2 * M * K * N

    xb = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    wb = jnp.asarray(rng.randn(K, N), jnp.bfloat16)
    dt = timed(lambda x: chain_dot(wb, iters, jnp.bfloat16,
                                   jnp.float32)(x), xb, iters)
    print(f"bf16 dot   [{M}x{K}]@[{K}x{N}]: {dt*1e6:.1f} us/dot, "
          f"{flops/dt/1e12:.1f} TFLOP/s")

    xi = jnp.asarray(rng.randint(-127, 128, (M, K)), jnp.int8)
    wi = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)
    dt = timed(lambda x: chain_dot(wi, iters, jnp.int8,
                                   jnp.int32)(x), xi, iters)
    print(f"int8 dot   [{M}x{K}]@[{K}x{N}]: {dt*1e6:.1f} us/dot, "
          f"{flops/dt/1e12:.1f} TOP/s")

    # conv form: 3x3/512ch on a 14x14 crop batch (res5 conv2, eval)
    B, H, W, C = 2000, 14, 14, 512
    cflops = 2 * B * H * W * 9 * C * C
    xcb = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    wcb = jnp.asarray(rng.randn(3, 3, C, C), jnp.bfloat16)

    def chain_conv(w, iters, acc_dt):
        def fn(x):
            def body(i, x):
                y = jax.lax.conv_general_dilated(
                    x, w, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=acc_dt)
                return (y >> 7).astype(x.dtype) \
                    if acc_dt == jnp.int32 else y.astype(x.dtype)
            return jax.lax.fori_loop(0, iters, body, x)
        return fn

    dt = timed(lambda x: chain_conv(wcb, 20, jnp.float32)(x), xcb, 20)
    print(f"bf16 conv3x3 [{B}x{H}x{W}x{C}]: {dt*1e3:.2f} ms, "
          f"{cflops/dt/1e12:.1f} TFLOP/s")

    xci = jnp.asarray(rng.randint(-127, 128, (B, H, W, C)), jnp.int8)
    wci = jnp.asarray(rng.randint(-8, 8, (3, 3, C, C)), jnp.int8)
    try:
        dt = timed(lambda x: chain_conv(wci, 20, jnp.int32)(x), xci, 20)
        print(f"int8 conv3x3 [{B}x{H}x{W}x{C}]: {dt*1e3:.2f} ms, "
              f"{cflops/dt/1e12:.1f} TOP/s")
    except Exception as e:  # noqa: BLE001 — record, don't crash
        print(f"int8 conv3x3: FAILED to lower: {type(e).__name__}: "
              f"{str(e)[:300]}")


if __name__ == "__main__":
    main()

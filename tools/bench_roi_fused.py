#!/usr/bin/env python
"""Device A/B: XLA separable-einsum ROIAlign vs the fused Pallas
kernel (ops/pallas_roi_align.py:roi_align_pallas_fused) at the STT
eval workload shapes (features [8, 50, 84, 1024] bf16, 1000 proposals,
pooled 14, adaptive sampling). The XLA form round-trips the
[B, n, Q, H, C] intermediate through HBM (~11.5 GB/step); the fused
kernel keeps it in VMEM.

Timing protocol for the shared axon chip (PERF.md): chained dependent
iterations (each step consumes a scalar derived from the previous
output) with one final materialization, best-of-reps.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def bench(fn, args, n_iter=10, reps=4):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(2):
        out = fn(*args)
    float(out.sum())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        f = args[0]
        for _ in range(n_iter):
            out = fn(f, *args[1:])
            f = args[0] + out.reshape(-1)[0] * 0.0
        float(out.sum())
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from locov_tpu.ops.pallas_roi_align import roi_align_pallas_fused
    from locov_tpu.ops.roi_align import roi_align_batched
    from locov_tpu.utils.misc import compile_cache_dir
    jax.config.update("jax_compilation_cache_dir", compile_cache_dir())

    B, H, W, C, N = 8, 50, 84, 1024, 1000
    sr = 0  # adaptive (the shipped POOLER_SAMPLING_RATIO)
    rng = np.random.RandomState(0)
    f = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32),
                    jnp.bfloat16)
    xy = rng.rand(B, N, 2) * 900
    wh = rng.rand(B, N, 2) * 400 + 16
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1)
                        .astype(np.float32))

    xla = jax.jit(lambda f, b: roi_align_batched(
        f, b, 1 / 16., pooled=14, sampling_ratio=sr,
        precision="default"))
    fused = jax.jit(lambda f, b: roi_align_pallas_fused(
        f, b, 1 / 16., pooled=14, sampling_ratio=sr))

    r_xla = jax.device_get(xla(f, boxes)).astype(np.float32)
    r_fus = jax.device_get(fused(f, boxes)).astype(np.float32)
    err = np.max(np.abs(r_xla - r_fus))
    ref = np.max(np.abs(r_xla)) + 1e-9
    print(f"max abs diff vs XLA: {err:.5f} (rel {err / ref:.2e})")

    t_xla = bench(xla, (f, boxes))
    t_fus = bench(fused, (f, boxes))
    print(f"XLA separable einsums : {t_xla * 1e3:8.2f} ms")
    print(f"Pallas fused          : {t_fus * 1e3:8.2f} ms "
          f"({t_xla / t_fus:.2f}x)")


if __name__ == "__main__":
    sys.exit(main())

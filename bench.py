#!/usr/bin/env python
"""Benchmark: LSM training step throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference published no throughput numbers (SURVEY.md §6); the
proxy baseline is the 8-GPU LSM training configuration (global batch
32 over 8 workers = 4 images/step/device). We measure LSM train-step
throughput in images/sec on one chip at the reference's per-device
batch size and report vs_baseline as measured / assumed-reference
(reference V100-era per-GPU throughput ~ 4 img / 0.6 s ≈ 6.7 img/s).
"""
import json
import sys
import time


def main():
    import jax
    import numpy as np

    import __graft_entry__ as ge
    from locov_tpu.engine.solver import build_optimizer, default_frozen_fn
    from locov_tpu.parallel import get_mesh, make_train_step, shard_batch

    # per-device batch 4 (= reference's 32 global / 8 GPUs), real-ish
    # LSM shapes scaled to bench budget
    batch = 4
    cfg, model, data, class_emb = ge._build(cfg_small=True, batch=batch,
                                            hw=512, text_len=16)
    key = jax.random.PRNGKey(0)
    params = model.init(key, data, class_emb, key, method=model.losses)
    optimizer, _ = build_optimizer(cfg, params,
                                   frozen_fn=default_frozen_fn(cfg))
    opt_state = optimizer.init(params)
    mesh = get_mesh(jax.devices()[:1])
    step = make_train_step(model, optimizer, mesh)
    data = shard_batch(data, mesh)

    # compile + warmup
    params, opt_state, m = step(params, opt_state, data, class_emb, key)
    jax.block_until_ready(m)
    n_iter = 10
    t0 = time.perf_counter()
    for i in range(n_iter):
        key, k = jax.random.split(key)
        params, opt_state, m = step(params, opt_state, data, class_emb, k)
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / n_iter
    ips = batch / dt

    baseline_ips = 6.7  # assumed reference per-GPU LSM throughput
    print(json.dumps({
        "metric": "lsm_train_images_per_sec_per_chip",
        "value": round(ips, 3),
        "unit": "img/s",
        "vs_baseline": round(ips / baseline_ips, 3),
    }))


if __name__ == "__main__":
    main()

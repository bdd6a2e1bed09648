#!/usr/bin/env python
"""Measure the global-contrastive BxB joint-encoder pass on the real
chip (TPU.CONTRASTIVE_SCOPE=global production-point validation).

Runs the TransformerHead (6L/8H multimodal BERT, coco_lsm.yaml
MMSS_HEAD.TRANSFORMER) fwd+bwd at a given number of (caption, image)
pairs with a given PAIRWISE_CHUNK, bf16 compute, R=100 regions + W=70
tokens — the workload of SURVEY §2c's BxB scaling reformulation at
global batch B, 1024 pairs = B=32 over a v5e-8.

Compiles and executes DIRECTLY on the default backend (no AOT helper —
the dev tunnel's chipless AOT compile path 500s; see PERF.md).

Usage:
  python tools/bench_pairwise.py [--batch 32] [--chunk 128] [--regions 100]
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
    ap.add_argument("--batch", type=int, default=32,
                    help="global batch B; pairs = B*B")
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--regions", type=int, default=100)
    ap.add_argument("--tokens", type=int, default=70)
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from locov_tpu.utils.misc import compile_cache_dir
    jax.config.update("jax_compilation_cache_dir", compile_cache_dir())

    from locov_tpu.config import config_path, get_cfg
    from locov_tpu.models.mmss.transformer_head import (
        TransformerHead, TransformerHeadConfig)
    from locov_tpu.structures.batches import (CaptionFeatures,
                                              RegionFeatures)

    cfg = get_cfg()
    cfg.merge_from_file(config_path("coco_lsm.yaml"))
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.PAIRWISE_CHUNK = args.chunk

    tcfg = TransformerHeadConfig.from_cfg(cfg)
    head = TransformerHead(tcfg, v_dim=2048, l_dim=768,
                           external_projection=False)

    b, r, w = args.batch, args.regions, args.tokens
    key = jax.random.PRNGKey(0)
    vocab = 30522
    image = RegionFeatures(
        features=jax.random.normal(key, (b, r, 2048), jnp.bfloat16),
        loc=jax.random.uniform(key, (b, r, 2)),
        mask=jnp.ones((b, r), jnp.int32))
    enc = jax.random.normal(key, (b, w, 768), jnp.bfloat16)
    caption = CaptionFeatures(
        input_ids=jax.random.randint(key, (b, w), 0, vocab),
        attention_mask=jnp.ones((b, w), jnp.int32),
        special_tokens_mask=jnp.zeros((b, w), jnp.int32),
        target_ids=jax.random.randint(key, (b, w), 0, vocab),
        mlm_mask=(jax.random.uniform(key, (b, w)) < 0.15).astype(
            jnp.int32),
        encoded_tokens=enc,
        input_embeddings=enc)
    word_emb = jax.random.normal(key, (vocab, 768), jnp.bfloat16)

    params = jax.jit(lambda i, c, we: head.init(
        jax.random.PRNGKey(0), i, c, we))(image, caption, word_emb)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"pairs={b * b} chunk={args.chunk} params={n_params / 1e6:.1f}M",
          file=sys.stderr)

    def loss_fn(p):
        out = head.apply(p, image, caption, word_emb)
        losses = out[1]  # (other, losses[, dist]) — LSM sets return_dist
        return sum(losses.values())

    if args.fwd_only:
        step = jax.jit(loss_fn)
    else:
        step = jax.jit(lambda p: (loss_fn(p),
                                  jax.grad(loss_fn)(p)))

    t0 = time.perf_counter()
    out = step(params)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    reps, iters = 3, 4
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(params)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)

    stats = jax.local_devices()[0].memory_stats() or {}
    hbm_gb = stats.get("peak_bytes_in_use", 0) / 2**30
    print(json.dumps({
        "metric": "pairwise_encoder_ms",
        "pairs": b * b, "chunk": args.chunk,
        "fwd_only": bool(args.fwd_only),
        "value": round(best * 1e3, 2), "unit": "ms",
        "compile_s": round(compile_s, 1),
        "peak_hbm_gb": round(hbm_gb, 2),
        "ms_per_pair": round(best * 1e3 / (b * b), 3),
    }))


if __name__ == "__main__":
    main()

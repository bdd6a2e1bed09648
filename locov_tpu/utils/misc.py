"""Small numeric helpers + VOC-style AP.

Ports of ``ovr/misc.py`` (dot-similarity / l2-normalize helpers) and
``ovr/utils/metrics.py`` (numpy VOC-AP helpers kept for parity; the
main eval path uses locov_tpu.evaluation.coco_eval).
"""
from __future__ import annotations

import numpy as np


def l2_normalize_np(x: np.ndarray, axis: int = -1,
                    eps: float = 1e-12) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=axis, keepdims=True), eps)


def dot_similarity_np(a: np.ndarray, b: np.ndarray,
                      normalize: bool = False) -> np.ndarray:
    """[N, D] x [M, D] -> [N, M] dot (optionally cosine) similarity."""
    if normalize:
        a = l2_normalize_np(a)
        b = l2_normalize_np(b)
    return a @ b.T


def voc_ap(recall: np.ndarray, precision: np.ndarray,
           use_07_metric: bool = False) -> float:
    """Classic VOC AP from a PR curve (utils/metrics.py behavior)."""
    if use_07_metric:
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            p = precision[recall >= t].max() if (recall >= t).any() else 0.0
            ap += p / 11.0
        return float(ap)
    mrec = np.concatenate(([0.0], recall, [1.0]))
    mpre = np.concatenate(([0.0], precision, [0.0]))
    for i in range(len(mpre) - 1, 0, -1):
        mpre[i - 1] = max(mpre[i - 1], mpre[i])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]).sum())


def parameter_count_table(params, max_depth: int = 2) -> str:
    """Per-module parameter counts (the reference prints a prettytable
    of these at startup; trainer.py:111 vicinity)."""
    from .checkpoint import flatten_params
    flat = flatten_params(params)
    agg = {}
    for k, v in flat.items():
        prefix = "/".join(k.split("/")[:max_depth])
        agg[prefix] = agg.get(prefix, 0) + int(np.prod(v.shape))
    total = sum(agg.values())
    lines = [f"{'module':50s} {'#params':>12s}"]
    for k in sorted(agg):
        lines.append(f"{k:50s} {agg[k]:12,d}")
    lines.append(f"{'TOTAL':50s} {total:12,d}")
    return "\n".join(lines)


def compile_cache_dir(base: str = "/tmp/jax_cache_tpu") -> str:
    """Persistent-compilation-cache dir keyed by the host's CPU
    feature flags. This machine migrates between hosts with different
    vector extensions, and XLA happily LOADS an AOT result compiled
    for a CPU the current host can't execute — observed as a mid-run
    SIGABRT/SIGILL rather than a cache miss. Keying the directory by
    /proc/cpuinfo flags turns a host change into a clean cold cache."""
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = ""
    return base + "_" + hashlib.md5(flags.encode()).hexdigest()[:10]

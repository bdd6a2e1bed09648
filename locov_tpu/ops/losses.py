"""Loss primitives (pure jnp, masked / static-shape).

Replaces fvcore's ``smooth_l1_loss``/``giou_loss`` and the masked-CE
patterns used throughout the reference (``box_emb_head.py:5``,
``grounding_head.py:270-290``, ``transformer_head.py:203-206``). All
reductions take explicit masks so padded elements contribute zero.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray,
              beta: float) -> jnp.ndarray:
    """Elementwise smooth-L1 (Huber); beta==0 degrades to pure L1,
    matching fvcore's behavior."""
    diff = jnp.abs(pred - target)
    if beta <= 1e-8:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def giou(pred_boxes: jnp.ndarray, target_boxes: jnp.ndarray) -> jnp.ndarray:
    """Elementwise GIoU loss (1 - GIoU) on aligned XYXY boxes [..., 4]."""
    px0, py0, px1, py1 = [pred_boxes[..., i] for i in range(4)]
    tx0, ty0, tx1, ty1 = [target_boxes[..., i] for i in range(4)]

    pa = jnp.maximum(px1 - px0, 0) * jnp.maximum(py1 - py0, 0)
    ta = jnp.maximum(tx1 - tx0, 0) * jnp.maximum(ty1 - ty0, 0)

    ix0, iy0 = jnp.maximum(px0, tx0), jnp.maximum(py0, ty0)
    ix1, iy1 = jnp.minimum(px1, tx1), jnp.minimum(py1, ty1)
    inter = jnp.maximum(ix1 - ix0, 0) * jnp.maximum(iy1 - iy0, 0)
    union = pa + ta - inter
    iou = inter / jnp.maximum(union, 1e-7)

    cx0, cy0 = jnp.minimum(px0, tx0), jnp.minimum(py0, ty0)
    cx1, cy1 = jnp.maximum(px1, tx1), jnp.maximum(py1, ty1)
    carea = jnp.maximum(cx1 - cx0, 0) * jnp.maximum(cy1 - cy0, 0)
    giou_val = iou - (carea - union) / jnp.maximum(carea, 1e-7)
    return 1.0 - giou_val


def softmax_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                          ignore_index: int = -1) -> jnp.ndarray:
    """Per-element CE with ignore_index semantics of
    ``nn.CrossEntropyLoss(ignore_index=-1, reduction='mean')``: returns
    (sum over valid, count of valid); caller divides. Shapes: logits
    [..., K], labels [...] int."""
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(
        logits, safe_labels[..., None], axis=-1).squeeze(-1)
    ce = jnp.where(valid, logz - picked, 0.0)
    return ce, valid


def mean_cross_entropy(logits, labels, ignore_index=-1):
    """Mean CE over non-ignored labels; 0 when nothing is valid (torch
    returns NaN there — we are empty-safe by design)."""
    ce, valid = softmax_cross_entropy(logits, labels, ignore_index)
    denom = jnp.maximum(valid.sum(), 1)
    return ce.sum() / denom


def binary_cross_entropy_with_logits(logits, targets, mask=None):
    """Empty-safe masked BCE-with-logits (reference
    ``logged_module.py`` helper: returns 0 on empty input)."""
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    if mask is None:
        size = loss.size
        return jnp.where(size > 0, loss.mean() if size else 0.0, 0.0)
    denom = jnp.maximum(mask.sum(), 1)
    return (loss * mask).sum() / denom


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray,
                   axis: int) -> jnp.ndarray:
    """Softmax treating masked-out entries as -inf; fully-masked rows
    return all-zeros (not NaN)."""
    neg = jnp.finfo(logits.dtype).min
    masked = jnp.where(mask, logits, neg)
    out = jax.nn.softmax(masked, axis=axis)
    any_valid = jnp.any(mask, axis=axis, keepdims=True)
    return jnp.where(any_valid, out, 0.0)


def masked_log_softmax(logits, mask, axis):
    neg = jnp.finfo(logits.dtype).min
    masked = jnp.where(mask, logits, neg)
    return jax.nn.log_softmax(masked, axis=axis)


def kl_div_batchmean(log_probs: jnp.ndarray,
                     target_probs: jnp.ndarray) -> jnp.ndarray:
    """KLDivLoss(reduction='batchmean'): sum(p * (log p - log q)) / B,
    with 0*log(0) = 0 (torch convention)."""
    logp = jnp.where(target_probs > 0, jnp.log(target_probs), 0.0)
    elt = jnp.where(target_probs > 0,
                    target_probs * (logp - log_probs), 0.0)
    return elt.sum() / log_probs.shape[0]


def normalize_vec(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def standardize_vec(x, axis=-1, eps=1e-12):
    mu = x.mean(axis=axis, keepdims=True)
    sd = x.std(axis=axis, keepdims=True)
    return (x - mu) / jnp.maximum(sd, eps)

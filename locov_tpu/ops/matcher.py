"""Vectorized, mask-aware IoU matcher and label subsampler.

Static-shape equivalents of detectron2's ``Matcher`` and
``subsample_labels`` (consumed by the reference at
``roi_emb_heads.py:78`` and via RPN label assignment). Instead of
per-image python loops over ragged gt lists, everything here is a fixed
[M_gt_max] x [N] problem with validity masks, vmappable over the batch.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def match(quality: jnp.ndarray, gt_mask: jnp.ndarray,
          thresholds: Sequence[float], labels: Sequence[int],
          allow_low_quality_matches: bool = False
          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Match each of N predictions to one of M (padded) ground truths.

    quality: [M, N] match quality (IoU); rows for padded gt are ignored.
    gt_mask: [M] bool validity of gt rows.
    thresholds/labels: d2 Matcher semantics — labels[i] applies to
        quality in [thresholds[i-1], thresholds[i]) with implicit
        -inf/+inf bounds. E.g. RPN: thresholds [0.3, 0.7], labels
        [0, -1, 1]; ROI: [0.5], [0, 1].

    Returns (matched_idx [N] int32, matched_label [N] int8). With no
    valid gt, labels are all `labels[0]` (d2 returns zeros there; the
    first label is 0 in every config we replicate).
    """
    thresholds = list(thresholds)
    labels = list(labels)
    assert len(labels) == len(thresholds) + 1

    neg = jnp.asarray(-1.0, quality.dtype)
    q = jnp.where(gt_mask[:, None], quality, neg)
    matched_vals = q.max(axis=0)
    matched_idx = q.argmax(axis=0).astype(jnp.int32)

    matched_label = jnp.full(quality.shape[1], labels[0], jnp.int8)
    bounds = [-jnp.inf] + thresholds + [jnp.inf]
    for lab, lo, hi in zip(labels, bounds[:-1], bounds[1:]):
        in_bin = (matched_vals >= lo) & (matched_vals < hi)
        matched_label = jnp.where(in_bin, jnp.int8(lab), matched_label)

    if allow_low_quality_matches:
        # For each gt, predictions tying its best quality become positive
        # (d2 set_low_quality_matches_: exact equality with per-gt max).
        highest_per_gt = q.max(axis=1, keepdims=True)
        is_best = (q == highest_per_gt) & gt_mask[:, None] & (
            highest_per_gt > 0)
        pred_is_best = jnp.any(is_best, axis=0)
        matched_label = jnp.where(pred_is_best, jnp.int8(1), matched_label)

    any_gt = jnp.any(gt_mask)
    matched_label = jnp.where(any_gt, matched_label, jnp.int8(labels[0]))
    matched_idx = jnp.where(any_gt, matched_idx, 0)
    return matched_idx, matched_label


def subsample_labels(labels: jnp.ndarray, num_samples: int,
                     positive_fraction: float, rng: jax.Array,
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Random fixed-size sample of positives/negatives.

    d2 ``subsample_labels`` semantics: positives are label==1, negatives
    label==0, label==-1 is ignored. Take up to
    ``int(num_samples*positive_fraction)`` random positives, fill the
    rest with random negatives.

    Returns (sampled_idx [num_samples] int32,
             sampled_is_pos [num_samples] bool,
             sampled_valid [num_samples] bool).
    Output is static-size; ``sampled_valid`` is False for unfilled slots
    (only possible when pos+neg candidates < num_samples).
    """
    n = labels.shape[0]
    is_pos = labels == 1
    is_neg = labels == 0

    k_pos, k_neg = jax.random.split(rng)
    # random priority sort within each class; excluded entries sink
    pos_keys = jnp.where(is_pos, jax.random.uniform(k_pos, (n,)), -1.0)
    neg_keys = jnp.where(is_neg, jax.random.uniform(k_neg, (n,)), -1.0)
    if n < num_samples:  # fewer candidates than slots: pad key arrays
        pad = jnp.full((num_samples - n,), -1.0)
        pos_keys = jnp.concatenate([pos_keys, pad])
        neg_keys = jnp.concatenate([neg_keys, pad])
    # top num_samples random candidates of each kind
    _, pos_order = jax.lax.top_k(pos_keys, num_samples)
    _, neg_order = jax.lax.top_k(neg_keys, num_samples)
    pos_order = jnp.minimum(pos_order, n - 1)
    neg_order = jnp.minimum(neg_order, n - 1)

    num_pos_avail = is_pos.sum()
    num_neg_avail = is_neg.sum()
    num_pos = jnp.minimum(num_pos_avail, int(num_samples * positive_fraction))
    num_neg = jnp.minimum(num_neg_avail, num_samples - num_pos)

    slots = jnp.arange(num_samples)
    take_pos = slots < num_pos
    neg_slot = jnp.clip(slots - num_pos, 0, num_samples - 1)
    sampled_idx = jnp.where(take_pos, pos_order,
                            neg_order[neg_slot]).astype(jnp.int32)
    sampled_valid = slots < (num_pos + num_neg)
    return sampled_idx, take_pos & sampled_valid, sampled_valid

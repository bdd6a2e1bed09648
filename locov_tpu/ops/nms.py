"""Static-shape exact greedy NMS for TPU.

Replaces detectron2's CUDA ``nms``/``batched_nms`` (imported by the
reference at ``box_emb_head.py:10`` and used inside RPN proposal
selection and fast_rcnn inference). Design: sort by score, then process
boxes in tiles — each tile is first suppressed by surviving earlier
tiles (one [T, N] IoU block), then resolved internally with the
antitone fixed-point iteration ``alive <- init & ~overlaps(alive)``,
which provably converges to the greedy solution in at most T steps
(each sweep finalizes at least the earliest undecided box). Sequential
depth is O(N/T + chain length) instead of O(N), and all work is dense
vector math the VPU likes.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..structures import boxes as box_ops

TILE = 256


def _pad_to_multiple(x, multiple, axis, value):
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad, constant_values=value)


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
             iou_threshold: float) -> jnp.ndarray:
    """Greedy NMS keep-mask over padded boxes.

    boxes: [N, 4] XYXY; scores: [N]; valid: [N] bool.
    Returns keep: [N] bool (in the ORIGINAL order).
    """
    n = boxes.shape[0]
    neg_inf = jnp.finfo(scores.dtype).min
    masked_scores = jnp.where(valid, scores, neg_inf)
    order = jnp.argsort(-masked_scores)
    boxes_s = boxes[order]
    valid_s = valid[order]

    boxes_p = _pad_to_multiple(boxes_s, TILE, 0, 0.0)
    valid_p = _pad_to_multiple(valid_s, TILE, 0, False)
    n_pad = boxes_p.shape[0]
    num_tiles = n_pad // TILE

    def self_suppress(iou_self, init_alive):
        tri = jnp.tril(jnp.ones((TILE, TILE), bool), k=-1)  # j<k suppressors
        sup_mat = (iou_self > iou_threshold) & tri.T  # [j, k] j suppresses k

        def cond(state):
            alive, prev, it = state
            return jnp.logical_and(it < TILE,
                                   jnp.logical_not(jnp.all(alive == prev)))

        def body(state):
            alive, _, it = state
            suppressed = jnp.any(sup_mat & alive[:, None], axis=0)
            return init_alive & ~suppressed, alive, it + 1

        first = init_alive & ~jnp.any(sup_mat & init_alive[:, None], axis=0)
        alive, _, _ = jax.lax.while_loop(
            cond, body, (first, init_alive, jnp.int32(0)))
        return alive

    def outer(i, active):
        start = i * TILE
        tile_boxes = jax.lax.dynamic_slice(boxes_p, (start, 0), (TILE, 4))
        tile_init = jax.lax.dynamic_slice(active, (start,), (TILE,))

        # suppression by surviving boxes in earlier tiles
        iou_cross = box_ops.pairwise_iou(tile_boxes, boxes_p)  # [T, n_pad]
        earlier = jnp.arange(n_pad)[None, :] < start
        sup = jnp.any((iou_cross > iou_threshold) & earlier & active[None, :],
                      axis=1)
        tile_alive = tile_init & ~sup

        # resolve within-tile order with the fixed-point iteration
        iou_self = box_ops.pairwise_iou(tile_boxes, tile_boxes)
        tile_alive = self_suppress(iou_self, tile_alive)
        return jax.lax.dynamic_update_slice(active, tile_alive, (start,))

    active = jax.lax.fori_loop(0, num_tiles, outer, valid_p)
    keep_sorted = active[:n]
    # scatter back to original order
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def nms_topk(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
             iou_threshold: float, max_out: int
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS returning the top-``max_out`` surviving indices by
    score (static shape).

    Returns (idx [max_out] int32 into the input arrays, keep_valid
    [max_out] bool)."""
    keep = nms_mask(boxes, scores, valid, iou_threshold)
    neg_inf = jnp.finfo(scores.dtype).min
    kept_scores = jnp.where(keep, scores, neg_inf)
    top_scores, idx = jax.lax.top_k(kept_scores, max_out)
    return idx.astype(jnp.int32), top_scores > neg_inf


def batched_nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray,
                     classes: jnp.ndarray, valid: jnp.ndarray,
                     iou_threshold: float) -> jnp.ndarray:
    """Per-class NMS via the coordinate-offset trick (d2 batched_nms):
    boxes of different classes are translated to disjoint regions so one
    class-agnostic NMS pass equals independent per-class passes."""
    max_coord = jnp.max(jnp.where(valid[..., None], boxes, 0.0)) + 1.0
    offsets = classes.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[..., None]
    return nms_mask(shifted, scores, valid, iou_threshold)

"""Pure-jnp box algebra.

TPU-native replacement for detectron2's ``Boxes`` /
``Box2BoxTransform`` / ``pairwise_iou`` object zoo (used at e.g.
reference ``ovr/modeling/roi_heads/roi_emb_heads.py:71-80`` and
``box_emb_head.py:155``): here boxes are plain ``[..., 4]`` XYXY arrays
with explicit validity masks, so every op is batched, static-shape, and
jit/vmap-friendly.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

# Matches detectron2's _DEFAULT_SCALE_CLAMP: clamp dw/dh before exp so
# decoded boxes can't blow up early in training.
SCALE_CLAMP = math.log(1000.0 / 16)


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of XYXY boxes; negative extents clamp to zero area."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def clip(boxes: jnp.ndarray, image_hw) -> jnp.ndarray:
    """Clip XYXY boxes to [0, W] x [0, H]. ``image_hw`` is (h, w)."""
    h, w = image_hw[0], image_hw[1]
    x0 = jnp.clip(boxes[..., 0], 0, w)
    y0 = jnp.clip(boxes[..., 1], 0, h)
    x1 = jnp.clip(boxes[..., 2], 0, w)
    y1 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x0, y0, x1, y1], axis=-1)


def nonempty(boxes: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    """Boolean mask of boxes with both sides > threshold."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return (w > threshold) & (h > threshold)


def centers(boxes: jnp.ndarray) -> jnp.ndarray:
    """(x, y) centers, matching d2 ``Boxes.get_centers``."""
    return (boxes[..., :2] + boxes[..., 2:]) / 2.0


def scale(boxes: jnp.ndarray, scale_x, scale_y) -> jnp.ndarray:
    sx = jnp.asarray(scale_x)
    sy = jnp.asarray(scale_y)
    return boxes * jnp.stack([sx, sy, sx, sy], axis=-1)


def xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    x, y, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x, y, x + w, y + h], axis=-1)


def xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x0, y0, x1 - x0, y1 - y0], axis=-1)


def pairwise_intersection(boxes1: jnp.ndarray,
                          boxes2: jnp.ndarray) -> jnp.ndarray:
    """Intersection areas between all pairs. [..., M, 4] x [..., N, 4]
    -> [..., M, N]."""
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """IoU between all pairs; empty boxes give IoU 0 (as in d2)."""
    a1 = area(boxes1)
    a2 = area(boxes2)
    inter = pairwise_intersection(boxes1, boxes2)
    union = a1[..., :, None] + a2[..., None, :] - inter
    return jnp.where(inter > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def pairwise_ioa(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Intersection-over-area of boxes2 (d2 ``pairwise_ioa``)."""
    a2 = area(boxes2)
    inter = pairwise_intersection(boxes1, boxes2)
    return jnp.where(inter > 0, inter / jnp.maximum(a2[..., None, :], 1e-12),
                     0.0)


def matched_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Element-wise IoU of aligned box arrays [..., 4] x [..., 4]."""
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area(boxes1) + area(boxes2) - inter
    return jnp.where(inter > 0, inter / jnp.maximum(union, 1e-12), 0.0)


# --------------------------------------------------------------------------
# Box2BoxTransform (delta encode/decode), matching d2 semantics exactly.
# --------------------------------------------------------------------------

def get_deltas(src_boxes: jnp.ndarray, target_boxes: jnp.ndarray,
               weights: Tuple[float, float, float, float]) -> jnp.ndarray:
    """Encode target boxes relative to source boxes as (dx, dy, dw, dh)."""
    src_w = src_boxes[..., 2] - src_boxes[..., 0]
    src_h = src_boxes[..., 3] - src_boxes[..., 1]
    src_cx = src_boxes[..., 0] + 0.5 * src_w
    src_cy = src_boxes[..., 1] + 0.5 * src_h

    tgt_w = target_boxes[..., 2] - target_boxes[..., 0]
    tgt_h = target_boxes[..., 3] - target_boxes[..., 1]
    tgt_cx = target_boxes[..., 0] + 0.5 * tgt_w
    tgt_cy = target_boxes[..., 1] + 0.5 * tgt_h

    wx, wy, ww, wh = weights
    # guard against zero-sized (padding) source boxes
    safe_w = jnp.maximum(src_w, 1e-6)
    safe_h = jnp.maximum(src_h, 1e-6)
    dx = wx * (tgt_cx - src_cx) / safe_w
    dy = wy * (tgt_cy - src_cy) / safe_h
    dw = ww * jnp.log(jnp.maximum(tgt_w, 1e-6) / safe_w)
    dh = wh * jnp.log(jnp.maximum(tgt_h, 1e-6) / safe_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def apply_deltas(deltas: jnp.ndarray, boxes: jnp.ndarray,
                 weights: Tuple[float, float, float, float],
                 scale_clamp: float = SCALE_CLAMP) -> jnp.ndarray:
    """Decode deltas on top of boxes. ``deltas`` may be [..., N, k*4] for
    k classes; boxes are broadcast per class. Returns same shape as
    deltas."""
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    wx, wy, ww, wh = weights
    d = deltas.reshape(deltas.shape[:-1] + (-1, 4))
    dx = d[..., 0] / wx
    dy = d[..., 1] / wy
    dw = jnp.minimum(d[..., 2] / ww, scale_clamp)
    dh = jnp.minimum(d[..., 3] / wh, scale_clamp)

    pred_ctr_x = dx * widths[..., None] + ctr_x[..., None]
    pred_ctr_y = dy * heights[..., None] + ctr_y[..., None]
    pred_w = jnp.exp(dw) * widths[..., None]
    pred_h = jnp.exp(dh) * heights[..., None]

    out = jnp.stack(
        [pred_ctr_x - 0.5 * pred_w, pred_ctr_y - 0.5 * pred_h,
         pred_ctr_x + 0.5 * pred_w, pred_ctr_y + 0.5 * pred_h], axis=-1)
    return out.reshape(deltas.shape)

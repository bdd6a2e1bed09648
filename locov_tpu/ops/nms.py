"""Static-shape exact greedy NMS for TPU — natively batched.

Replaces detectron2's CUDA ``nms``/``batched_nms`` (imported by the
reference at ``box_emb_head.py:10`` and used inside RPN proposal
selection and fast_rcnn inference). Design: sort by score, then process
boxes in tiles — each tile is first suppressed by surviving earlier
tiles (one [B, T, N] IoU block), then resolved internally with the
antitone fixed-point iteration ``alive <- init & ~overlaps(alive)``,
which provably converges to the greedy solution in at most T sweeps
(each sweep finalizes at least the earliest undecided box). Sequential
depth is O(N/T + chain length) instead of O(N), and all work is dense
VPU/MXU-friendly batched math.

The batch dimension is native (leading axis of every op) rather than
vmapped: vmapping the loop nest multiplied XLA compile time by orders
of magnitude on TPU, while the batched formulation compiles once.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

TILE = 256   # default suppression tile (see _pick_tile)


def _pick_tile(stop_after: int) -> int:
    """Tile size for the suppression sweep. The sweep is LATENCY-bound
    (nested while loops; each trip costs fixed overhead), so large
    stop_after targets want big tiles (fewer trips), while small ones
    want small tiles: the compacted survivor buffer is padded to
    stop_after + tile, so an oversized tile multiplies every tile's
    [B, tile, cap] IoU block. Measured on the v5e (PERF.md round 3):
    RPN train (12032 boxes, stop 2000): tile 512 beats 256 by ~0.5
    img/s and 1024 regresses; STT eval at tile 512 regresses 54 -> 46
    img/s on BOTH its sweeps (per-class, 4096 boxes stop 100, and RPN
    6000 boxes stop 1000) — only the deep train-RPN sweep benefits."""
    return 512 if stop_after >= 2000 else 256



def _pairwise_iou_b(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[B, M, 4] x [B, N, 4] -> [B, M, N] IoU."""
    lt = jnp.maximum(a[:, :, None, :2], b[:, None, :, :2])
    rb = jnp.minimum(a[:, :, None, 2:], b[:, None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.maximum(a[..., 2] - a[..., 0], 0) * \
        jnp.maximum(a[..., 3] - a[..., 1], 0)
    area_b = jnp.maximum(b[..., 2] - b[..., 0], 0) * \
        jnp.maximum(b[..., 3] - b[..., 1], 0)
    union = area_a[:, :, None] + area_b[:, None, :] - inter
    return jnp.where(inter > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def _pad_axis1(x, multiple, value):
    n = x.shape[1]
    rem = (-n) % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[1] = (0, rem)
    return jnp.pad(x, pad, constant_values=value)


def nms_mask_batched(boxes: jnp.ndarray, scores: jnp.ndarray,
                     valid: jnp.ndarray, iou_threshold: float,
                     stop_after: int = 0,
                     classes: jnp.ndarray | None = None) -> jnp.ndarray:
    """Greedy NMS keep-mask over padded boxes, batched.

    boxes: [B, N, 4] XYXY; scores: [B, N]; valid: [B, N] bool.
    Returns keep: [B, N] bool (in the ORIGINAL order).

    classes [B, N] int (optional): suppression only acts within a
    class (suppression masks are ANDed with class equality; in the
    compacted stop_after path the survivor buffer carries a class slot
    next to the box slots). This is
    how per-class NMS stays EXACT — torchvision's coordinate-offset
    trick loses float32 precision at offset scale (ulp(cls*span) ~
    5e-4 px flips near-threshold IoUs; observed on TPU at production
    coordinate scale) and breaks outright for negative coordinates.

    stop_after > 0: two changes, both EXACT for top-k consumers
    (``nms_topk_batched``) and only for them:
    (a) the tile sweep stops once every batch row has ``stop_after``
        survivors among the already-decided (higher-scoring) boxes;
        later boxes are reported suppressed;
    (b) when the input spans more than two tiles, each tile is
        suppressed against a COMPACTED buffer of alive earlier boxes
        (capacity ``stop_after`` + one tile) instead of all earlier
        boxes — O(N * stop_after) IoU work instead of O(N^2); smaller
        inputs run the plain exact sweep (same results). A row that overflows the buffer may mis-decide boxes
        AFTER its ``stop_after``-th survivor, but the first
        ``stop_after`` survivors (the only ones top-k returns — they
        are decided in score order, before any overflow) are always
        exact: every drop requires >= capacity >= stop_after prior
        insertions in that row.
    """
    TILE = _pick_tile(stop_after)
    bsz, n = scores.shape
    neg_inf = jnp.finfo(scores.dtype).min
    masked_scores = jnp.where(valid, scores, neg_inf)
    order = jnp.argsort(-masked_scores, axis=1)
    take = jnp.take_along_axis
    boxes_s = take(boxes, order[..., None], axis=1)
    valid_s = take(valid, order, axis=1)

    boxes_p = _pad_axis1(boxes_s, TILE, 0.0)
    valid_p = _pad_axis1(valid_s, TILE, False)
    if classes is None:
        cls_p = None
    else:
        cls_p = _pad_axis1(take(classes, order, axis=1), TILE, -1)
    n_pad = boxes_p.shape[1]
    num_tiles = n_pad // TILE
    tri_sup = jnp.triu(jnp.ones((TILE, TILE), bool), k=1)  # j<k: [j, k]

    def self_suppress(iou_self, init_alive, same_class=True):
        """iou_self: [B, T, T]; init_alive: [B, T]."""
        sup_mat = (iou_self > iou_threshold) & tri_sup[None] & same_class

        def cond(state):
            alive, prev, it = state
            return jnp.logical_and(it < TILE,
                                   jnp.logical_not(
                                       jnp.all(alive == prev)))

        def sweep(alive):
            suppressed = jnp.any(sup_mat & alive[:, :, None], axis=1)
            return init_alive & ~suppressed

        def body(state):
            alive, _, it = state
            # two sweeps per trip: each [B, T, T] and-reduce is ~µs of
            # VPU work but every while iteration pays fixed loop
            # overhead; convergence is still detected (monotone w.r.t.
            # the two-step map, and sweep(fixpoint) == fixpoint)
            return sweep(sweep(alive)), alive, it + 1

        first = sweep(init_alive)
        alive, _, _ = jax.lax.while_loop(
            cond, body, (first, init_alive, jnp.int32(0)))
        return alive

    def outer(i, active):
        start = i * TILE
        tile_boxes = jax.lax.dynamic_slice_in_dim(boxes_p, start, TILE,
                                                  axis=1)
        tile_init = jax.lax.dynamic_slice_in_dim(active, start, TILE,
                                                 axis=1)
        cross_ok = jnp.ones((), bool)
        self_ok = jnp.ones((), bool)
        if cls_p is not None:
            tile_cls = jax.lax.dynamic_slice_in_dim(cls_p, start, TILE,
                                                    axis=1)
            cross_ok = tile_cls[:, :, None] == cls_p[:, None, :]
            self_ok = tile_cls[:, :, None] == tile_cls[:, None, :]
        iou_cross = _pairwise_iou_b(tile_boxes, boxes_p)  # [B, T, n_pad]
        earlier = jnp.arange(n_pad)[None, None, :] < start
        sup = jnp.any((iou_cross > iou_threshold) & cross_ok & earlier
                      & active[:, None, :], axis=2)
        tile_alive = tile_init & ~sup
        iou_self = _pairwise_iou_b(tile_boxes, tile_boxes)
        tile_alive = self_suppress(iou_self, tile_alive,
                                   same_class=self_ok)
        return jax.lax.dynamic_update_slice_in_dim(active, tile_alive,
                                                   start, axis=1)

    # The compacted buffer only pays when the input spans several
    # tiles; tiny inputs run the plain exact sweep below. (This also
    # sidesteps a hard XLA:CPU runtime abort observed when the
    # compacted while_loop runs at single-tile shapes inside the
    # sharded train step — see tests/test_integration.py; the TPU
    # production shapes always take the compacted path and are
    # covered by tools/tpu_checks.py.)
    if stop_after > 0 and num_tiles > 2:
        pos = jnp.arange(n_pad)[None, :]
        cap = min(-(-(stop_after + TILE) // TILE) * TILE, n_pad)
        slot = jnp.arange(cap)

        def cond(state):
            i, active, surv, scls, cnt = state
            return (i < num_tiles) & ~jnp.all(cnt >= stop_after)

        def body(state):
            i, active, surv, scls, cnt = state
            start = i * TILE
            tile_boxes = jax.lax.dynamic_slice_in_dim(
                boxes_p, start, TILE, axis=1)
            tile_init = jax.lax.dynamic_slice_in_dim(
                active, start, TILE, axis=1)
            iou_s = _pairwise_iou_b(tile_boxes, surv)  # [B, T, cap]
            in_buf = slot[None, None, :] < cnt[:, None, None]
            hit = (iou_s > iou_threshold) & in_buf
            self_ok = jnp.ones((), bool)
            if cls_p is not None:
                # class slot next to the box slots: buffered classes
                # are stored +1 so empty slots (0) never match
                tile_cls = jax.lax.dynamic_slice_in_dim(
                    cls_p, start, TILE, axis=1)
                hit &= tile_cls[:, :, None] + 1 == scls[:, None, :]
                self_ok = tile_cls[:, :, None] == tile_cls[:, None, :]
            sup = jnp.any(hit, axis=2)
            iou_self = _pairwise_iou_b(tile_boxes, tile_boxes)
            tile_alive = self_suppress(iou_self, tile_init & ~sup,
                                       same_class=self_ok)
            # compact-insert this tile's survivors (slots are unique,
            # so the one-hot matmul accumulate writes each slot once)
            csum = jnp.cumsum(tile_alive.astype(jnp.int32), axis=1)
            dst = cnt[:, None] + csum - tile_alive
            dst = jnp.where(tile_alive & (dst < cap), dst, cap)
            onehot = (dst[:, :, None] == slot[None, None, :])
            # HIGHEST precision is mandatory: at default (bf16 MXU)
            # precision the buffered coordinates round to bf16 (~5 px
            # at 1344-px scale) and near-threshold IoU decisions flip,
            # breaking the exactness contract (confirmed on v5e)
            surv = surv + jnp.einsum(
                "btc,btj->bcj", onehot.astype(boxes_p.dtype),
                jnp.where(tile_alive[..., None], tile_boxes, 0.0),
                precision=jax.lax.Precision.HIGHEST)
            if cls_p is not None:
                scls = scls + jnp.einsum(
                    "btc,bt->bc", onehot.astype(jnp.int32),
                    jnp.where(tile_alive, tile_cls + 1, 0))
            cnt = jnp.minimum(cnt + csum[:, -1], cap)
            active = jax.lax.dynamic_update_slice_in_dim(
                active, tile_alive, start, axis=1)
            return i + 1, active, surv, scls, cnt

        # initial carries must inherit the device-varying type of the
        # sharded inputs: under shard_map a plain-zeros carry is
        # "unvarying" while the loop body's update is varying, which
        # ill-types the while_loop (shard_map varying-axes check; seen
        # as a hard abort from the trainer's pjit path)
        vary_i = 0 * jnp.sum(valid_p, axis=1, dtype=jnp.int32)
        surv0 = jnp.zeros((bsz, cap, 4), boxes_p.dtype) \
            + 0.0 * boxes_p[:, :1]
        scls0 = jnp.zeros((bsz, cap), jnp.int32) + vary_i[:, None]
        cnt0 = jnp.zeros((bsz,), jnp.int32) + vary_i
        i_stop, active, _, _, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), valid_p, surv0, scls0, cnt0))
        # everything past the stop point is reported suppressed
        active = active & (pos < i_stop * TILE)
    else:
        active = jax.lax.fori_loop(0, num_tiles, outer, valid_p)
    keep_sorted = active[:, :n]
    # scatter back to original order
    keep = jnp.zeros((bsz, n), bool)
    batch_idx = jnp.arange(bsz)[:, None]
    keep = keep.at[batch_idx, order].set(keep_sorted)
    return keep


def nms_topk_batched(boxes: jnp.ndarray, scores: jnp.ndarray,
                     valid: jnp.ndarray, iou_threshold: float,
                     max_out: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS returning the top-``max_out`` surviving indices per
    batch row. Returns (idx [B, max_out] int32, keep_valid [B, max_out]).
    The tile sweep stops early once every row has max_out survivors
    (exact — see nms_mask_batched)."""
    keep = nms_mask_batched(boxes, scores, valid, iou_threshold,
                            stop_after=max_out)
    neg_inf = jnp.finfo(scores.dtype).min
    kept_scores = jnp.where(keep, scores, neg_inf)
    top_scores, idx = jax.lax.top_k(kept_scores, max_out)
    return idx.astype(jnp.int32), top_scores > neg_inf


def batched_nms_mask_batched(boxes, scores, classes, valid,
                             iou_threshold: float,
                             stop_after: int = 0) -> jnp.ndarray:
    """Per-class NMS, batched: suppression acts only within a class.
    boxes [B, N, 4], classes [B, N] int. Implemented by class-equality
    masking of the suppression matrices, NOT torchvision's
    coordinate-offset trick — see ``nms_mask_batched``.

    stop_after > 0 enables the compacted O(N*stop_after) survivor
    buffer + early tile stop; exact for consumers that only read the
    global top-``stop_after`` surviving scores (survivors are decided
    in score order across classes, so the first stop_after of them are
    final before any buffer overflow can occur)."""
    return nms_mask_batched(boxes, scores, valid, iou_threshold,
                            stop_after=stop_after, classes=classes)


# ---------------------------------------------------------------- single
def nms_mask(boxes, scores, valid, iou_threshold: float):
    """Single-image wrapper: [N, 4] -> keep [N]."""
    return nms_mask_batched(boxes[None], scores[None], valid[None],
                            iou_threshold)[0]


def nms_topk(boxes, scores, valid, iou_threshold: float, max_out: int):
    idx, ok = nms_topk_batched(boxes[None], scores[None], valid[None],
                               iou_threshold, max_out)
    return idx[0], ok[0]


def batched_nms_mask(boxes, scores, classes, valid, iou_threshold: float):
    return batched_nms_mask_batched(boxes[None], scores[None],
                                    classes[None], valid[None],
                                    iou_threshold)[0]

"""Region Proposal Network (single-level C4), fully static-shape.

From-scratch equivalent of detectron2's ``RPN`` + anchor generator +
proposal selection (the reference builds it via
``build_proposal_generator``, ``distill_prop_mmss_gcnn.py:154-156`` /
``ovr_rcnn.py:54-57``). Differences from the reference stack are purely
structural: per-image ragged proposal lists become fixed
[POST_NMS_TOPK, 4] arrays with validity masks, label assignment and
sampling are the masked vectorized ops from ``locov_tpu.ops``, and NMS
is the tiled TPU kernel. Numerics (IoU thresholds, low-quality matches,
loss normalization by BATCH_SIZE_PER_IMAGE * B) follow d2.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import matcher as matcher_ops
from ..ops import nms as nms_ops
from ..ops.losses import smooth_l1
from ..structures import boxes as box_ops
from ..structures.batches import GtBatch, ProposalBatch

# d2 add_ground_truth_to_proposals uses logit of (1 - 1e-10)
GT_PROPOSAL_LOGIT = math.log((1.0 - 1e-10) / (1e-10))


def generate_cell_anchors(sizes, aspect_ratios) -> jnp.ndarray:
    """[A, 4] anchors centered at (0, 0) — d2 DefaultAnchorGenerator."""
    anchors = []
    for size in sizes:
        area = float(size) ** 2
        for ar in aspect_ratios:
            w = math.sqrt(area / ar)
            h = w * ar
            anchors.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return jnp.asarray(anchors, jnp.float32)


def grid_anchors(cell_anchors: jnp.ndarray, grid_h: int, grid_w: int,
                 stride: int, offset: float = 0.0) -> jnp.ndarray:
    """[grid_h * grid_w * A, 4] anchors over the feature grid."""
    shift_x = (jnp.arange(grid_w, dtype=jnp.float32) + offset) * stride
    shift_y = (jnp.arange(grid_h, dtype=jnp.float32) + offset) * stride
    sx, sy = jnp.meshgrid(shift_x, shift_y)  # [gh, gw]
    shifts = jnp.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
    out = shifts + cell_anchors[None, :, :]
    return out.reshape(-1, 4)


class RPNHead(nn.Module):
    """3x3 conv + sibling 1x1 objectness / anchor-delta convs
    (d2 StandardRPNHead)."""
    num_anchors: int
    conv_dim: int
    compute_dtype: object = None

    @nn.compact
    def __call__(self, x):
        # computation dtype follows the trunk (params stay f32); the
        # caller upcasts logits/deltas to f32 before losses
        t = nn.Conv(self.conv_dim, (3, 3), padding=1,
                    kernel_init=nn.initializers.normal(0.01),
                    dtype=self.compute_dtype, name="conv")(x)
        t = nn.relu(t)
        logits = nn.Conv(self.num_anchors, (1, 1),
                         kernel_init=nn.initializers.normal(0.01),
                         dtype=self.compute_dtype,
                         name="objectness_logits")(t)
        deltas = nn.Conv(self.num_anchors * 4, (1, 1),
                         kernel_init=nn.initializers.normal(0.01),
                         dtype=self.compute_dtype,
                         name="anchor_deltas")(t)
        b = x.shape[0]
        return (logits.reshape(b, -1),
                deltas.reshape(b, -1, 4))


class RPNConfig(NamedTuple):
    sizes: tuple
    aspect_ratios: tuple
    stride: int
    offset: float
    iou_thresholds: tuple
    iou_labels: tuple
    batch_size_per_image: int
    positive_fraction: float
    bbox_reg_weights: tuple
    smooth_l1_beta: float
    loss_weight: float
    pre_nms_topk_train: int
    pre_nms_topk_test: int
    post_nms_topk_train: int
    post_nms_topk_test: int
    nms_thresh: float
    min_size: float

    @classmethod
    def from_cfg(cls, cfg):
        return cls(
            sizes=tuple(cfg.MODEL.ANCHOR_GENERATOR.SIZES[0]),
            aspect_ratios=tuple(cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS[0]),
            stride=16,
            offset=cfg.MODEL.ANCHOR_GENERATOR.OFFSET,
            iou_thresholds=tuple(cfg.MODEL.RPN.IOU_THRESHOLDS),
            iou_labels=tuple(cfg.MODEL.RPN.IOU_LABELS),
            batch_size_per_image=cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE,
            positive_fraction=cfg.MODEL.RPN.POSITIVE_FRACTION,
            bbox_reg_weights=tuple(cfg.MODEL.RPN.BBOX_REG_WEIGHTS),
            smooth_l1_beta=cfg.MODEL.RPN.SMOOTH_L1_BETA,
            loss_weight=cfg.MODEL.RPN.LOSS_WEIGHT,
            pre_nms_topk_train=cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN,
            pre_nms_topk_test=cfg.MODEL.RPN.PRE_NMS_TOPK_TEST,
            post_nms_topk_train=cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN,
            post_nms_topk_test=cfg.MODEL.RPN.POST_NMS_TOPK_TEST,
            nms_thresh=cfg.MODEL.RPN.NMS_THRESH,
            min_size=cfg.MODEL.PROPOSAL_GENERATOR.MIN_SIZE)


def rpn_losses(anchors: jnp.ndarray, logits: jnp.ndarray,
               deltas: jnp.ndarray, gt: GtBatch, rpn_cfg: RPNConfig,
               rng: jax.Array):
    """RPN objectness + box-regression losses over a batch.

    anchors: [N_a, 4]; logits: [B, N_a]; deltas: [B, N_a, 4].
    """
    b = logits.shape[0]

    def per_image(logits_i, deltas_i, gt_boxes, gt_mask, key):
        quality = box_ops.pairwise_iou(gt_boxes, anchors)  # [M, N_a]
        midx, label = matcher_ops.match(
            quality, gt_mask, rpn_cfg.iou_thresholds, rpn_cfg.iou_labels,
            allow_low_quality_matches=True)
        sampled_idx, is_pos, valid = matcher_ops.subsample_labels(
            label.astype(jnp.int32), rpn_cfg.batch_size_per_image,
            rpn_cfg.positive_fraction, key)

        obj_target = is_pos.astype(jnp.float32)
        obj_logit = logits_i[sampled_idx]
        bce = (jnp.maximum(obj_logit, 0) - obj_logit * obj_target
               + jnp.log1p(jnp.exp(-jnp.abs(obj_logit))))
        loss_cls = jnp.where(valid, bce, 0.0).sum()

        matched_gt = gt_boxes[midx[sampled_idx]]
        gt_deltas = box_ops.get_deltas(anchors[sampled_idx], matched_gt,
                                       rpn_cfg.bbox_reg_weights)
        l1 = smooth_l1(deltas_i[sampled_idx], gt_deltas,
                       rpn_cfg.smooth_l1_beta).sum(-1)
        loss_box = jnp.where(is_pos, l1, 0.0).sum()
        return loss_cls, loss_box

    keys = jax.random.split(rng, b)
    loss_cls, loss_box = jax.vmap(per_image)(
        logits, deltas, gt.boxes, gt.mask, keys)
    normalizer = rpn_cfg.batch_size_per_image * b
    return {
        "loss_rpn_cls": loss_cls.sum() / normalizer * rpn_cfg.loss_weight,
        "loss_rpn_loc": loss_box.sum() / normalizer * rpn_cfg.loss_weight,
    }


def select_proposals(anchors: jnp.ndarray, logits: jnp.ndarray,
                     deltas: jnp.ndarray, image_hw: jnp.ndarray,
                     rpn_cfg: RPNConfig, training: bool) -> ProposalBatch:
    """Top-k -> decode -> clip -> NMS -> fixed-K proposals per image.

    Fully batched (the NMS loop nest must not sit under vmap — that
    multiplied XLA compile time by orders of magnitude on TPU)."""
    pre_topk = (rpn_cfg.pre_nms_topk_train if training
                else rpn_cfg.pre_nms_topk_test)
    post_topk = (rpn_cfg.post_nms_topk_train if training
                 else rpn_cfg.post_nms_topk_test)
    pre_topk = min(pre_topk, anchors.shape[0])

    top_scores, idx = jax.lax.top_k(logits, pre_topk)  # [B, K]
    sel_deltas = jnp.take_along_axis(deltas, idx[..., None], axis=1)
    sel_anchors = anchors[idx]                         # [B, K, 4]
    boxes = box_ops.apply_deltas(sel_deltas, sel_anchors,
                                 rpn_cfg.bbox_reg_weights)
    # clip to per-image valid size
    h = image_hw[:, 0:1].astype(boxes.dtype)
    w = image_hw[:, 1:2].astype(boxes.dtype)
    boxes = jnp.stack([
        jnp.clip(boxes[..., 0], 0, w), jnp.clip(boxes[..., 1], 0, h),
        jnp.clip(boxes[..., 2], 0, w), jnp.clip(boxes[..., 3], 0, h),
    ], axis=-1)
    valid = box_ops.nonempty(boxes, rpn_cfg.min_size)
    valid &= jnp.isfinite(top_scores)
    keep_idx, keep_valid = nms_ops.nms_topk_batched(
        boxes, top_scores, valid, rpn_cfg.nms_thresh, post_topk)
    out_boxes = jnp.take_along_axis(boxes, keep_idx[..., None], axis=1)
    out_scores = jnp.take_along_axis(top_scores, keep_idx, axis=1)
    return ProposalBatch(boxes=out_boxes, objectness=out_scores,
                         mask=keep_valid)


def add_gt_to_proposals(proposals: ProposalBatch,
                        gt: GtBatch) -> ProposalBatch:
    """Concatenate (padded) gt boxes to the proposal set with a huge
    objectness logit (d2 add_ground_truth_to_proposals)."""
    gt_logits = jnp.where(gt.mask, GT_PROPOSAL_LOGIT, -1e10)
    return ProposalBatch(
        boxes=jnp.concatenate([proposals.boxes, gt.boxes], axis=1),
        objectness=jnp.concatenate([proposals.objectness, gt_logits],
                                   axis=1),
        mask=jnp.concatenate([proposals.mask, gt.mask], axis=1))

"""Embedding-based FastRCNN output layers + batched inference.

Re-implements the reference's ``EmbeddingFastRCNNOutputLayers``
(``ovr/modeling/roi_heads/box_emb_head.py:60-249``): per-region features
project to the BERT embedding space via ``emb_pred`` (Linear 2048->768)
and classification logits are a dot product against a FROZEN class-name
embedding matrix (set per dataset at runtime,
``set_class_embeddings`` box_emb_head.py:214-236). Here the class
matrix is an explicit forward input instead of a mutated submodule, so
swapping eval vocabularies never recompiles the network body.

Also hosts the static-shape equivalent of d2's ``fast_rcnn_inference``
(score threshold -> per-class NMS -> top-k), consumed at
``roi_emb_heads.py:280,357``.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import nms as nms_ops
from ..ops.losses import mean_cross_entropy, smooth_l1, giou, normalize_vec, \
    standardize_vec
from ..structures import boxes as box_ops
from ..structures.batches import Detections


class BoxPredictorConfig(NamedTuple):
    num_classes: int              # foreground classes (bg handled via +1)
    emb_dim: int
    embedding_based: bool
    normalize_emb: bool
    standardize_emb: bool
    detach_cls_predictor: bool
    cls_agnostic_bbox_reg: bool
    bbox_reg_weights: tuple
    smooth_l1_beta: float
    box_reg_loss_type: str
    box_reg_loss_weight: float
    test_score_thresh: float
    test_nms_thresh: float
    test_topk_per_image: int
    # static cap on (box, class) candidates entering NMS at inference
    test_nms_candidates: int = 4096
    # predictor selection (reference build_box_predictor,
    # box_emb_head.py:239-249) + grounding-classifier options
    # (box_emb_grounding_head.py:353-360)
    name: str = ""
    grounding_local_metric: str = "dot"
    grounding_alignment: str = "softmax"
    grounding_temperature: float = 10.0

    @classmethod
    def from_cfg(cls, cfg):
        return cls(
            name=cfg.MODEL.ROI_BOX_HEAD.NAME,
            grounding_local_metric=cfg.MODEL.MMSS_HEAD.GROUNDING
            .LOCAL_METRIC,
            grounding_alignment=cfg.MODEL.MMSS_HEAD.GROUNDING.ALIGNMENT,
            grounding_temperature=cfg.MODEL.MMSS_HEAD.GROUNDING
            .ALIGNMENT_TEMPERATURE,
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            emb_dim=cfg.MODEL.ROI_BOX_HEAD.EMB_DIM,
            embedding_based=cfg.MODEL.ROI_BOX_HEAD.EMBEDDING_BASED,
            normalize_emb=cfg.MODEL.ROI_BOX_HEAD.NORMALIZE_EMB_PRED,
            standardize_emb=cfg.MODEL.ROI_BOX_HEAD.STANDARDIZE_EMB_PRED,
            detach_cls_predictor=cfg.MODEL.ROI_HEADS.DETACH_CLASS_PREDICTOR,
            cls_agnostic_bbox_reg=cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG,
            bbox_reg_weights=tuple(cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS),
            smooth_l1_beta=cfg.MODEL.ROI_BOX_HEAD.SMOOTH_L1_BETA,
            box_reg_loss_type=cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_LOSS_TYPE,
            box_reg_loss_weight=cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_LOSS_WEIGHT,
            test_score_thresh=cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
            test_nms_thresh=cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
            test_topk_per_image=cfg.TEST.DETECTIONS_PER_IMAGE)


class EmbeddingBoxPredictor(nn.Module):
    """emb_pred + class-agnostic bbox_pred. Classification happens
    against the runtime ``class_emb`` matrix ([K+1, emb_dim], last row =
    background zeros as built at dataset registration)."""
    pcfg: BoxPredictorConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, class_emb: jnp.ndarray,
                 emb_override: jnp.ndarray = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: [..., C_in]. Returns (scores [..., K+1], deltas [..., 4]).

        emb_override: pre-projected embeddings from a shared (tied)
        v2l_projection; when given, the internal emb_pred is bypassed —
        the functional analogue of the weight tie at
        distill_prop_mmss_gcnn.py:117-125."""
        deltas = nn.Dense(4, kernel_init=nn.initializers.normal(0.001),
                          name="bbox_pred")(x)

        cls_in = jax.lax.stop_gradient(x) if self.pcfg.detach_cls_predictor \
            else x
        if emb_override is not None:
            emb = jax.lax.stop_gradient(emb_override) \
                if self.pcfg.detach_cls_predictor else emb_override
            if self.pcfg.normalize_emb:
                emb = normalize_vec(emb)
            if self.pcfg.standardize_emb:
                emb = standardize_vec(emb)
        elif self.pcfg.embedding_based:
            emb = nn.Dense(self.pcfg.emb_dim,
                           kernel_init=nn.initializers.normal(0.01),
                           name="emb_pred")(cls_in)
            if self.pcfg.normalize_emb:
                emb = normalize_vec(emb)
            if self.pcfg.standardize_emb:
                emb = standardize_vec(emb)
        else:
            emb = cls_in
        cemb = class_emb
        if self.pcfg.normalize_emb:
            cemb = normalize_vec(cemb)
        if self.pcfg.standardize_emb:
            cemb = standardize_vec(cemb)
        scores = emb @ cemb.T  # frozen linear, bias 0
        if self.pcfg.detach_cls_predictor:
            scores = jax.lax.stop_gradient(scores)
        return scores, deltas


def fast_rcnn_losses(scores: jnp.ndarray, deltas: jnp.ndarray,
                     proposal_boxes: jnp.ndarray, gt_classes: jnp.ndarray,
                     gt_boxes: jnp.ndarray, valid: jnp.ndarray,
                     pcfg: BoxPredictorConfig) -> Dict[str, jnp.ndarray]:
    """d2 FastRCNNOutputLayers.losses over a flattened sampled batch.

    scores: [R, K+1]; deltas: [R, 4] (class-agnostic); gt_classes: [R]
    (K = background); valid: [R] sample-slot validity.
    loss_cls: mean CE over valid; loss_box_reg: sum of fg smooth-l1 /
    num-valid (d2 normalizes by gt_classes.numel()).
    """
    labels = jnp.where(valid, gt_classes, -1)
    loss_cls = mean_cross_entropy(scores, labels, ignore_index=-1)

    num_classes = scores.shape[-1] - 1
    is_fg = valid & (gt_classes >= 0) & (gt_classes < num_classes)
    if pcfg.box_reg_loss_type == "smooth_l1":
        gt_deltas = box_ops.get_deltas(proposal_boxes, gt_boxes,
                                       pcfg.bbox_reg_weights)
        per = smooth_l1(deltas, gt_deltas, pcfg.smooth_l1_beta).sum(-1)
    elif pcfg.box_reg_loss_type == "giou":
        pred = box_ops.apply_deltas(deltas, proposal_boxes,
                                    pcfg.bbox_reg_weights)
        per = giou(pred, gt_boxes)
    else:
        raise NotImplementedError(pcfg.box_reg_loss_type)
    denom = jnp.maximum(valid.sum(), 1.0)
    loss_box = jnp.where(is_fg, per, 0.0).sum() / denom
    if pcfg.detach_cls_predictor:
        loss_cls = 0.0 * loss_cls
    return {"loss_cls": loss_cls,
            "loss_box_reg": loss_box * pcfg.box_reg_loss_weight}


def fast_rcnn_inference_batched(scores: jnp.ndarray, deltas: jnp.ndarray,
                                proposal_boxes: jnp.ndarray,
                                proposal_mask: jnp.ndarray,
                                image_hw: jnp.ndarray,
                                pcfg: BoxPredictorConfig) -> Detections:
    """Static-shape fast_rcnn_inference, fully batched.

    scores: [B, N, K+1] raw logits; deltas: [B, N, 4] (class-agnostic);
    proposal_boxes: [B, N, 4]. softmax -> drop bg -> score thresh ->
    per-class NMS (class-equality masking inside the IoU sweep; the
    coordinate-offset trick is avoided repo-wide — negative coords +
    f32 offset rounding make it inexact on device) -> top-k. The NMS
    loop nest runs batched, never under vmap (compile-time hazard on
    TPU)."""
    probs = jax.nn.softmax(scores, axis=-1)[..., :-1]  # [B, N, K]
    b, n, k = probs.shape
    boxes = box_ops.apply_deltas(deltas, proposal_boxes,
                                 pcfg.bbox_reg_weights)
    h = image_hw[:, 0:1, None].astype(boxes.dtype)
    w = image_hw[:, 1:2, None].astype(boxes.dtype)
    boxes = jnp.stack([
        jnp.clip(boxes[..., 0], 0, w[..., 0]),
        jnp.clip(boxes[..., 1], 0, h[..., 0]),
        jnp.clip(boxes[..., 2], 0, w[..., 0]),
        jnp.clip(boxes[..., 3], 0, h[..., 0])], axis=-1)

    flat_scores = probs.reshape(b, n * k)
    flat_classes = jnp.tile(jnp.arange(k, dtype=jnp.int32), (b, n))
    flat_boxes = jnp.broadcast_to(boxes[:, :, None, :],
                                  (b, n, k, 4)).reshape(b, n * k, 4)
    base_valid = proposal_mask & box_ops.nonempty(boxes)
    flat_valid = (flat_scores > pcfg.test_score_thresh) & jnp.repeat(
        base_valid, k, axis=1)

    n_cand = min(pcfg.test_nms_candidates, n * k)
    cand_scores, cand_idx = jax.lax.top_k(
        jnp.where(flat_valid, flat_scores, -1.0), n_cand)
    cand_boxes = jnp.take_along_axis(flat_boxes, cand_idx[..., None],
                                     axis=1)
    cand_classes = jnp.take_along_axis(flat_classes, cand_idx, axis=1)
    cand_valid = cand_scores > jnp.maximum(pcfg.test_score_thresh, 0.0)

    # stop_after = the top-k this function returns: turns on the
    # compacted O(N*k) survivor buffer + early tile stop (exact for
    # top-k consumers — see nms_mask_batched); without it the 4096
    # candidates pay the full O(N^2/TILE) tile sweep
    keep = nms_ops.batched_nms_mask_batched(
        cand_boxes, cand_scores, cand_classes, cand_valid,
        pcfg.test_nms_thresh, stop_after=pcfg.test_topk_per_image)
    kept_scores = jnp.where(keep, cand_scores, -1.0)
    top_scores, top_idx = jax.lax.top_k(kept_scores,
                                        pcfg.test_topk_per_image)
    return Detections(
        boxes=jnp.take_along_axis(cand_boxes, top_idx[..., None], axis=1),
        scores=top_scores,
        classes=jnp.take_along_axis(cand_classes, top_idx, axis=1),
        mask=top_scores > 0.0)


def fast_rcnn_inference(scores, deltas, proposal_boxes, proposal_mask,
                        image_hw, pcfg):
    """Single-image wrapper."""
    dets = fast_rcnn_inference_batched(
        scores[None], deltas[None], proposal_boxes[None],
        proposal_mask[None], image_hw[None], pcfg)
    return Detections(*[x[0] for x in dets])

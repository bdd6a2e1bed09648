"""C4 ROI heads (Res5), static-shape.

Re-implements the reference's ``SampleAllROIHeads`` /
``EmbeddingRes5ROIHeads`` / ``EmbeddingProposalsRes5ROIHeads``
(``ovr/modeling/roi_heads/roi_emb_heads.py``): IoU matching + fixed-size
proposal sampling (the per-image python loop at roi_emb_heads.py:69-111
becomes one vmapped masked op), ROIAlign -> shared res5 -> mean-pool ->
embedding box predictor. The proposals variant additionally runs res5
over the whole feature grid and returns per-image box features for the
MMSS heads (roi_emb_heads.py:310-349).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import matcher as matcher_ops
from ..ops.roi_align import roi_align_batched
from ..structures import boxes as box_ops
from ..structures.batches import GtBatch, ProposalBatch
from .box_predictor import (BoxPredictorConfig, EmbeddingBoxPredictor,
                            fast_rcnn_losses)
from .resnet import ResNetStage
from .rpn import add_gt_to_proposals


class ROIHeadsConfig(NamedTuple):
    num_classes: int
    batch_size_per_image: int
    positive_fraction: float
    iou_thresholds: tuple
    iou_labels: tuple
    proposal_append_gt: bool
    pooler_resolution: int
    pooler_sampling_ratio: int
    feature_stride: int
    use_pallas_roi_align: bool = False
    # static-int8 serving: run ROIAlign itself int8 x int8 (int8 chunk
    # intermediates halve this HBM-bound op's traffic; see
    # ops/roi_align.py roi_align_batched_int8). TPU.INT8_ROIALIGN.
    int8_roialign: bool = True

    @classmethod
    def from_cfg(cls, cfg):
        sr = cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO
        return cls(
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            batch_size_per_image=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
            positive_fraction=cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
            iou_thresholds=tuple(cfg.MODEL.ROI_HEADS.IOU_THRESHOLDS),
            iou_labels=tuple(cfg.MODEL.ROI_HEADS.IOU_LABELS),
            proposal_append_gt=cfg.MODEL.ROI_HEADS.PROPOSAL_APPEND_GT,
            pooler_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
            # d2 sampling_ratio 0 = ADAPTIVE (ceil(roi_size/pooled)
            # samples per bin) — the reference's operating point; the
            # XLA path implements it statically (ops/roi_align.py
            # _adaptive_coords). The Pallas variant is a fixed-grid
            # kernel, so it substitutes ratio 2 when adaptive is asked.
            pooler_sampling_ratio=sr,
            feature_stride=16,
            use_pallas_roi_align=cfg.TPU.USE_PALLAS_ROIALIGN,
            int8_roialign=cfg.TPU.INT8_ROIALIGN)


class SampledProposals(NamedTuple):
    boxes: jnp.ndarray       # [B, S, 4]
    gt_classes: jnp.ndarray  # [B, S] int32, num_classes == background
    gt_boxes: jnp.ndarray    # [B, S, 4] matched gt for box reg
    is_fg: jnp.ndarray       # [B, S] bool ("fg_proposal" flag)
    valid: jnp.ndarray       # [B, S] bool


def label_and_sample_proposals(proposals: ProposalBatch, gt: GtBatch,
                               rcfg: ROIHeadsConfig, rng: jax.Array
                               ) -> SampledProposals:
    """Masked equivalent of SampleAllROIHeads.label_and_sample_proposals
    (roi_emb_heads.py:24-118): append gt, IoU-match, label fg/bg,
    subsample to a fixed S with at most positive_fraction positives."""
    if rcfg.proposal_append_gt:
        proposals = add_gt_to_proposals(proposals, gt)
    b = proposals.boxes.shape[0]

    def per_image(prop_boxes, prop_mask, gt_boxes, gt_classes, gt_mask, key):
        quality = box_ops.pairwise_iou(gt_boxes, prop_boxes)
        midx, mlabel = matcher_ops.match(
            quality, gt_mask, rcfg.iou_thresholds, rcfg.iou_labels)
        cls = jnp.where(mlabel == 1, gt_classes[midx], rcfg.num_classes)
        cls = jnp.where(mlabel == -1, -1, cls)

        is_pos = (cls >= 0) & (cls < rcfg.num_classes)
        is_neg = cls == rcfg.num_classes
        # padding proposals can never be sampled
        sample_label = jnp.where(prop_mask,
                                 jnp.where(is_pos, 1,
                                           jnp.where(is_neg, 0, -1)), -1)
        sampled_idx, _, valid = matcher_ops.subsample_labels(
            sample_label, rcfg.batch_size_per_image,
            rcfg.positive_fraction, key)

        s_boxes = prop_boxes[sampled_idx]
        s_cls = jnp.where(valid, cls[sampled_idx], rcfg.num_classes)
        s_gt_boxes = gt_boxes[midx[sampled_idx]]
        s_fg = valid & (s_cls < rcfg.num_classes)
        return SampledProposals(s_boxes, s_cls, s_gt_boxes, s_fg, valid)

    keys = jax.random.split(rng, b)
    return jax.vmap(per_image)(proposals.boxes, proposals.mask, gt.boxes,
                               gt.classes, gt.mask, keys)


class Res5ROIHeads(nn.Module):
    """Shared res5 box head + embedding predictor. One flax module so
    res5 parameters are shared between the ROI path and the grid path
    (EmbeddingProposalsRes5ROIHeads calls res5 on both,
    roi_emb_heads.py:323,327)."""
    rcfg: ROIHeadsConfig
    pcfg: BoxPredictorConfig
    stride_in_1x1: bool = True
    res2_out_channels: int = 256
    num_groups: int = 1
    width_per_group: int = 64
    compute_dtype: object = None
    # static-int8 serving (TPU.INT8_SCHEME='static'): owns the pooled
    # tensor's calibrated max-abs so the quantize can fuse into
    # ROIAlign's chunk epilogues (variables must be declared in setup
    # for non-compact methods)
    int8_static: bool = False

    def setup(self):
        if self.int8_static:
            self.pooled_amax = self.variable(
                "quant", "pooled_amax",
                lambda: jnp.zeros((), jnp.float32))
            # calibrated max-abs of the res4 features entering ROIAlign
            # (TPU.INT8_ROIALIGN: the whole op runs int8 x int8)
            self.roialign_amax = self.variable(
                "quant", "roialign_amax",
                lambda: jnp.zeros((), jnp.float32))
        self.res5 = ResNetStage(
            num_blocks=3,
            bottleneck_channels=self.num_groups * self.width_per_group * 8,
            out_channels=self.res2_out_channels * 8,
            first_stride=2, stride_in_1x1=self.stride_in_1x1,
            compute_dtype=self.compute_dtype)
        # predictor selection by MODEL.ROI_BOX_HEAD.NAME (reference
        # build_box_predictor, box_emb_head.py:239-249); the grounding
        # variant scores classes by multi-token alignment
        if self.pcfg.name == "EmbeddingGroundingFastRCNNOutputLayers":
            from .box_emb_grounding import EmbeddingGroundingBoxPredictor
            self.box_predictor = EmbeddingGroundingBoxPredictor(
                emb_dim=self.pcfg.emb_dim,
                local_metric=self.pcfg.grounding_local_metric,
                alignment=self.pcfg.grounding_alignment,
                temperature=self.pcfg.grounding_temperature,
                normalize_emb=self.pcfg.normalize_emb,
                detach_cls_predictor=self.pcfg.detach_cls_predictor)
        else:
            self.box_predictor = EmbeddingBoxPredictor(self.pcfg)

    def roi_features(self, features: jnp.ndarray, boxes: jnp.ndarray,
                     int8: bool = False) -> jnp.ndarray:
        """ROIAlign + res5 + global mean pool.
        features: [B, H, W, C]; boxes: [B, S, 4] -> [B, S, 2048].

        int8 modes (serving; see models/resnet.py): in "static" mode
        the pooled tensor's quantize fuses into ROIAlign's chunk
        epilogues and res5 consumes the int8 directly; "calibrate"
        records the pooled max-abs here (plus per-conv maxima inside
        res5) into the mutable ``quant`` collection."""
        b, s = boxes.shape[:2]
        # bf16 features -> default (bf16-MXU) interpolation passes;
        # f32 features keep exact interpolation
        prec = "default" if features.dtype == jnp.bfloat16 \
            else "highest"
        if int8 == "static":
            from ..ops.int8_conv import QuantizedTensor
            from ..ops.roi_align import (roi_align_batched_int8,
                                         roi_align_batched_quant)
            if self.rcfg.int8_roialign:
                q, scale = roi_align_batched_int8(
                    features, boxes, 1.0 / self.rcfg.feature_stride,
                    self.roialign_amax.value, self.pooled_amax.value,
                    pooled=self.rcfg.pooler_resolution,
                    sampling_ratio=self.rcfg.pooler_sampling_ratio)
            else:
                q, scale = roi_align_batched_quant(
                    features, boxes, 1.0 / self.rcfg.feature_stride,
                    self.pooled_amax.value,
                    pooled=self.rcfg.pooler_resolution,
                    sampling_ratio=self.rcfg.pooler_sampling_ratio,
                    precision=prec)
            pooled = QuantizedTensor(
                q.reshape((b * s,) + q.shape[2:]), scale)
        elif self.rcfg.use_pallas_roi_align:
            from ..ops.pallas_roi_align import roi_align_pallas
            pooled = roi_align_pallas(
                features, boxes, 1.0 / self.rcfg.feature_stride,
                self.rcfg.pooler_resolution,
                self.rcfg.pooler_sampling_ratio
                if self.rcfg.pooler_sampling_ratio > 0 else 2)
            pooled = pooled.reshape((b * s,) + pooled.shape[2:])
        else:
            pooled = roi_align_batched(
                features, boxes, 1.0 / self.rcfg.feature_stride,
                pooled=self.rcfg.pooler_resolution,
                sampling_ratio=self.rcfg.pooler_sampling_ratio,
                precision=prec)
            pooled = pooled.reshape((b * s,) + pooled.shape[2:])
            if int8 == "calibrate":
                cur = jnp.max(jnp.abs(pooled.astype(jnp.float32)))
                self.pooled_amax.value = jnp.maximum(
                    self.pooled_amax.value, cur)
                fcur = jnp.max(jnp.abs(features.astype(jnp.float32)))
                self.roialign_amax.value = jnp.maximum(
                    self.roialign_amax.value, fcur)
        out = self.res5(pooled, int8=int8)
        out = out.mean(axis=(1, 2))
        return out.reshape(b, s, -1)

    def grid_features(self, features: jnp.ndarray) -> jnp.ndarray:
        """res5 over the whole image grid (shared params with the ROI
        path)."""
        return self.res5(features)

    def predict(self, box_features: jnp.ndarray, class_emb):
        """class_emb: [K+1, D] matrix, or ClassTokenEmbeddings
        ([K+1, T, D] + mask) when the grounding predictor is selected
        and class names tokenize to several BERT tokens."""
        if self.pcfg.name == "EmbeddingGroundingFastRCNNOutputLayers":
            from .box_emb_grounding import ClassTokenEmbeddings
            if not isinstance(class_emb, ClassTokenEmbeddings):
                class_emb = ClassTokenEmbeddings(
                    tokens=class_emb[:, None, :],
                    mask=jnp.ones(class_emb.shape[:1] + (1,),
                                  class_emb.dtype))
            return self.box_predictor(box_features, class_emb)
        return self.box_predictor(box_features, class_emb)

    def __call__(self, features, boxes, class_emb):
        # default path, used for init
        bf = self.roi_features(features, boxes)
        return self.predict(bf, class_emb)


def roi_heads_losses(scores, deltas, sampled: SampledProposals,
                     pcfg: BoxPredictorConfig) -> Dict[str, jnp.ndarray]:
    """Flatten the per-image sample dimension and apply FastRCNN losses."""
    flat = lambda x: x.reshape((-1,) + x.shape[2:])
    return fast_rcnn_losses(
        flat(scores), flat(deltas), flat(sampled.boxes),
        flat(sampled.gt_classes), flat(sampled.gt_boxes),
        flat(sampled.valid), pcfg)

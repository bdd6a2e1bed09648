"""OvrRCNN: the STT-stage detector (Faster R-CNN C4 with an
embedding-based zero-shot classifier).

Behavioral port of the reference meta-arch
(``ovr/modeling/meta_arch/ovr_rcnn.py:20-124``): backbone -> RPN ->
EmbeddingRes5ROIHeads, training returns ``({}, losses)``; inference
runs RPN (PRE_NMS 6000 -> NMS -> 1000) -> roi heads ->
fast_rcnn_inference -> rescale to original image size. The whole
train/eval step is one jittable function over static padded batches.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...structures import boxes as box_ops
from ...structures.batches import (DetectionBatch, Detections,
                                   ImageBatch)
from ..box_predictor import (BoxPredictorConfig,
                             fast_rcnn_inference_batched)
from ..resnet import ResNetC4
from ..roi_heads import (ROIHeadsConfig, Res5ROIHeads,
                         label_and_sample_proposals, roi_heads_losses)
from ..rpn import (RPNConfig, RPNHead, generate_cell_anchors, grid_anchors,
                   rpn_losses, select_proposals)


from .. import register_meta_arch


def normalize_and_zero_pad(images: ImageBatch, pixel_mean, pixel_std,
                           dtype) -> jnp.ndarray:
    """(x - mean) / std, with the padding region forced to ZERO.

    d2's ImageList.from_tensors pads AFTER normalization, so the pad
    value every conv sees is exactly 0; our collator pads the raw
    canvas with zeros BEFORE normalization, which would leave
    -mean/std in the pad region (up to ~-120 under Caffe2 PIXEL_STD=1)
    and corrupt features within a receptive field of the valid edge —
    a silent AP-parity risk caught while composing the end-to-end
    torch golden."""
    mean = jnp.asarray(pixel_mean, jnp.float32)
    std = jnp.asarray(pixel_std, jnp.float32)
    x = (images.image - mean) / std
    h = jnp.arange(x.shape[1], dtype=jnp.int32)
    w = jnp.arange(x.shape[2], dtype=jnp.int32)
    valid = ((h[None, :, None] < images.hw[:, 0, None, None]) &
             (w[None, None, :] < images.hw[:, 1, None, None]))
    x = jnp.where(valid[..., None], x, 0.0)
    return x.astype(dtype)


def _require_proposals(batch: DetectionBatch):
    """PrecomputedProposals path (reference ovr_rcnn.py:59-61): the
    loader fills DetectionBatch.proposals from the OLN pkl when
    MODEL.LOAD_OBJ_PROPOSALS is on and the dataset registers
    object_proposals; anything else is a config error."""
    if batch.proposals is None:
        raise ValueError(
            "MODEL.PROPOSAL_GENERATOR.NAME='PrecomputedProposals' needs "
            "precomputed proposals in the batch: set "
            "MODEL.LOAD_OBJ_PROPOSALS=True and use a dataset registered "
            "with object proposals (the OLN pkl), or switch back to "
            "MODEL.PROPOSAL_GENERATOR.NAME='RPN'.")
    return batch.proposals


@register_meta_arch("OvrRCNN")
class OvrRCNN(nn.Module):
    """cfg-derived static configuration + submodules."""
    depth: int
    num_groups: int
    width_per_group: int
    stem_out_channels: int
    res2_out_channels: int
    stride_in_1x1: bool
    pixel_mean: tuple
    pixel_std: tuple
    rpn_cfg: RPNConfig
    rcfg: ROIHeadsConfig
    pcfg: BoxPredictorConfig
    compute_dtype: jnp.dtype = jnp.float32
    remat_backbone: bool = False
    freeze_at: int = 0
    use_rpn: bool = True
    # TPU.INT8_EVAL: opt-in int8 serving mode — trunk (res2-res4) and
    # res5 convs quantize per forward (ops/int8_conv.py). Inference
    # only; the training path is untouched. TPU.INT8_SCHEME picks the
    # activation-scale scheme: "dynamic" (data-free, measured slower —
    # PERF.md) or "static" (calibrated via ``calibrate_int8`` with
    # ``mutable=["quant"]`` on a few batches first).
    int8_eval: bool = False
    int8_scheme: str = "dynamic"

    @classmethod
    def from_cfg(cls, cfg, **overrides):
        import numpy as np
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" \
            else jnp.float32
        kw = dict(
            depth=cfg.MODEL.RESNETS.DEPTH,
            num_groups=cfg.MODEL.RESNETS.NUM_GROUPS,
            width_per_group=cfg.MODEL.RESNETS.WIDTH_PER_GROUP,
            stem_out_channels=cfg.MODEL.RESNETS.STEM_OUT_CHANNELS,
            res2_out_channels=cfg.MODEL.RESNETS.RES2_OUT_CHANNELS,
            stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            rpn_cfg=RPNConfig.from_cfg(cfg),
            rcfg=ROIHeadsConfig.from_cfg(cfg),
            pcfg=BoxPredictorConfig.from_cfg(cfg),
            compute_dtype=dtype,
            remat_backbone=cfg.TPU.REMAT_BACKBONE,
            freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
            use_rpn=(cfg.MODEL.PROPOSAL_GENERATOR.NAME
                     != 'PrecomputedProposals'),
            int8_eval=cfg.TPU.INT8_EVAL,
            int8_scheme=cfg.TPU.INT8_SCHEME)
        kw.update(overrides)
        return cls(**kw)

    def setup(self):
        self.backbone = ResNetC4(
            depth=self.depth, out_features=("res4",),
            num_groups=self.num_groups,
            width_per_group=self.width_per_group,
            stem_out_channels=self.stem_out_channels,
            res2_out_channels=self.res2_out_channels,
            stride_in_1x1=self.stride_in_1x1,
            compute_dtype=self.compute_dtype,
            remat=self.remat_backbone,
            freeze_at=self.freeze_at)
        if self.use_rpn:
            self.rpn_head = RPNHead(
                num_anchors=len(self.rpn_cfg.sizes) *
                len(self.rpn_cfg.aspect_ratios),
                conv_dim=self.res2_out_channels * 4,
                compute_dtype=self.compute_dtype)
        self.roi_heads = Res5ROIHeads(
            rcfg=self.rcfg, pcfg=self.pcfg,
            stride_in_1x1=self.stride_in_1x1,
            res2_out_channels=self.res2_out_channels,
            num_groups=self.num_groups,
            width_per_group=self.width_per_group,
            compute_dtype=self.compute_dtype,
            int8_static=(self.int8_eval
                         and self.int8_scheme == "static"))

    # ---------------------------------------------------------------- utils
    def preprocess(self, images: ImageBatch) -> jnp.ndarray:
        return normalize_and_zero_pad(images, self.pixel_mean,
                                      self.pixel_std, self.compute_dtype)

    def run_rpn(self, features: jnp.ndarray, images: ImageBatch,
                training: bool) -> Tuple[jnp.ndarray, jnp.ndarray,
                                         jnp.ndarray]:
        logits, deltas = self.rpn_head(features)
        cell = generate_cell_anchors(self.rpn_cfg.sizes,
                                     self.rpn_cfg.aspect_ratios)
        anchors = grid_anchors(cell, features.shape[1], features.shape[2],
                               self.rpn_cfg.stride, self.rpn_cfg.offset)
        return anchors, logits.astype(jnp.float32), \
            deltas.astype(jnp.float32)

    # ---------------------------------------------------------------- train
    def losses(self, batch: DetectionBatch, class_emb: jnp.ndarray,
               rng: jax.Array,
               deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """Training forward; the reference returns ``({}, losses)``
        (ovr_rcnn.py:74), we return the loss dict."""
        images = batch.images
        x = self.preprocess(images)
        features = self.backbone(x)["res4"]
        losses = {}

        if self.use_rpn:
            anchors, logits, deltas = self.run_rpn(features, images, True)
            rng, k = jax.random.split(rng)
            losses.update(rpn_losses(anchors, logits, deltas, batch.gt,
                                     self.rpn_cfg, k))
            # proposals are fixed inputs to the second stage (d2 decodes
            # them under no_grad)
            proposals = select_proposals(
                anchors, jax.lax.stop_gradient(logits),
                jax.lax.stop_gradient(deltas), images.hw, self.rpn_cfg,
                training=True)
        else:
            proposals = _require_proposals(batch)

        rng, k = jax.random.split(rng)
        sampled = label_and_sample_proposals(proposals, batch.gt,
                                             self.rcfg, k)
        box_feats = self.roi_heads.roi_features(features, sampled.boxes)
        scores, deltas2 = self.roi_heads.predict(
            box_feats.astype(jnp.float32), class_emb)
        losses.update(roi_heads_losses(scores, deltas2, sampled, self.pcfg))
        return losses

    # ------------------------------------------------------------ inference
    def _int8_mode(self):
        return self.int8_scheme if self.int8_eval else False

    def inference(self, batch: DetectionBatch,
                  class_emb: jnp.ndarray) -> Detections:
        return self._inference(batch, class_emb, self._int8_mode())

    def calibrate_int8(self, batch: DetectionBatch,
                       class_emb: jnp.ndarray) -> Detections:
        """One calibration pass for the static int8 scheme: records
        running per-conv activation maxima into the ``quant``
        collection. Call via ``model.apply(vars, batch, class_emb,
        method=model.calibrate_int8, mutable=["quant"])`` on a few
        representative batches, then run ``inference`` with the
        updated variables."""
        return self._inference(batch, class_emb, "calibrate")

    def _inference(self, batch: DetectionBatch, class_emb: jnp.ndarray,
                   int8_mode) -> Detections:
        images = batch.images
        x = self.preprocess(images)
        features = self.backbone(x, int8=int8_mode)["res4"]

        if self.use_rpn:
            anchors, logits, deltas = self.run_rpn(features, images, False)
            proposals = select_proposals(anchors, logits, deltas,
                                         images.hw, self.rpn_cfg,
                                         training=False)
        else:
            proposals = _require_proposals(batch)

        box_feats = self.roi_heads.roi_features(features, proposals.boxes,
                                                int8=int8_mode)
        scores, deltas2 = self.roi_heads.predict(
            box_feats.astype(jnp.float32), class_emb)
        dets = fast_rcnn_inference_batched(
            scores, deltas2, proposals.boxes, proposals.mask, images.hw,
            self.pcfg)
        # detector_postprocess: rescale to original image size
        scale = images.orig_hw.astype(jnp.float32) / \
            images.hw.astype(jnp.float32)  # [B, 2] (h, w)
        boxes = box_ops.scale(dets.boxes, scale[:, None, 1],
                              scale[:, None, 0])
        boxes = jax.vmap(box_ops.clip)(boxes, images.orig_hw)
        return dets._replace(boxes=boxes)

"""LSM meta-architectures: image-caption pretraining models.

Behavioral ports of the reference family:

- ``MMSSGridModel`` (``ovr/modeling/meta_arch/mmss_gcnn.py:22-192``):
  backbone grid features + caption -> MMSS heads.
- ``DistillMMSSGridModel`` (``distill_mmss_gcnn.py:21-209``): adds the
  mutual-distillation loss between the transformer and grounding heads.
- ``DistillProposalMMSSRCNN`` (``distill_prop_mmss_gcnn.py:30-558``,
  the LSM flagship): language backbone + visual backbone + RPN +
  EmbeddingProposalsRes5ROIHeads (detector losses) + grid MMSS pass +
  box MMSS pass (<=100 random sampled boxes with normalized centers)
  + kd/box_kd/mixbox_kd distillation losses.
- ``DistillOnlyProposalMMSSRCNN`` (``distill_prop_mmss_gcnn.py:562-710``):
  box MMSS pass only.

TPU restructurings: the per-image numpy loops building grid masks,
normalized loc grids and spatial dropout (distill_prop_mmss_gcnn.py:
281-320) become vectorized masked ops inside the single jitted step;
ragged per-image box lists become the fixed-size sampled-proposal
arrays with validity masks.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...structures import boxes as box_ops
from ...structures.batches import (CaptionFeatures, DetectionBatch,
                                   Detections, ImageBatch, RegionFeatures)
from .. import register_meta_arch
from ..box_predictor import (BoxPredictorConfig,
                             fast_rcnn_inference_batched)
from ..mmss import (GroundingConfig, GroundingHead, TransformerHead,
                    TransformerHeadConfig)
from ..resnet import ResNetC4
from ..roi_heads import (ROIHeadsConfig, Res5ROIHeads,
                         label_and_sample_proposals, roi_heads_losses)
from ..rpn import (RPNConfig, RPNHead, generate_cell_anchors, grid_anchors,
                   rpn_losses, select_proposals)


def _lang_bert_cfg(cfg):
    from ..bert import BertConfig
    return BertConfig.from_cfg_node(
        cfg.MODEL.LANGUAGE_BACKBONE.BERT_CONFIG)


def make_grid_regions(grid_feats: jnp.ndarray, image_hw: jnp.ndarray,
                      padded_hw: Tuple[int, int]) -> RegionFeatures:
    """Flatten a [B, gh, gw, C] feature grid into masked regions with
    normalized (x, y) locations. Vectorized port of the reference's
    per-image loops (distill_prop_mmss_gcnn.py:281-299): grid cell
    (y, x) is valid iff y < ceil(h_i * gh / H) and x < ceil(w_i * gw / W),
    and loc = ((x + .5)/gs_w, (y + .5)/gs_h)."""
    b, gh, gw, _ = grid_feats.shape
    hpad, wpad = padded_hw
    gs_h = jnp.ceil(image_hw[:, 0].astype(jnp.float32) * gh / hpad)
    gs_w = jnp.ceil(image_hw[:, 1].astype(jnp.float32) * gw / wpad)
    ys = jnp.arange(gh, dtype=jnp.float32)
    xs = jnp.arange(gw, dtype=jnp.float32)
    mask_y = ys[None, :] < gs_h[:, None]            # [B, gh]
    mask_x = xs[None, :] < gs_w[:, None]            # [B, gw]
    mask = mask_y[:, :, None] & mask_x[:, None, :]  # [B, gh, gw]
    loc_y = (ys[None, :] + 0.5) / jnp.maximum(gs_h[:, None], 1.0)
    loc_x = (xs[None, :] + 0.5) / jnp.maximum(gs_w[:, None], 1.0)
    loc = jnp.stack([
        jnp.broadcast_to(loc_x[:, None, :], (b, gh, gw)),
        jnp.broadcast_to(loc_y[:, :, None], (b, gh, gw))], axis=-1)
    loc = jnp.where(mask[..., None], loc, 0.0)
    feats = jnp.where(mask[..., None], grid_feats, 0.0)
    return RegionFeatures(
        features=feats.reshape(b, gh * gw, -1),
        mask=mask.reshape(b, gh * gw),
        loc=loc.reshape(b, gh * gw, 2))


def spatial_dropout(regions: RegionFeatures, k: int,
                    rng: jax.Array) -> RegionFeatures:
    """Keep up to ``k`` random valid regions per image
    (distill_prop_mmss_gcnn.py:302-320), as a fixed-size top-k gather."""
    b, n = regions.mask.shape
    keys = jax.random.uniform(rng, (b, n))
    keys = jnp.where(regions.mask, keys, -1.0)
    kk = min(k, n)
    top_keys, idx = jax.lax.top_k(keys, kk)       # [B, k]
    valid = top_keys >= 0.0
    take = jax.vmap(lambda x, i: x[i])
    feats = take(regions.features, idx)
    loc = take(regions.loc, idx)
    feats = jnp.where(valid[..., None], feats, 0.0)
    loc = jnp.where(valid[..., None], loc, 0.0)
    return RegionFeatures(features=feats, mask=valid, loc=loc)


def box_regions(boxes: jnp.ndarray, box_feats: jnp.ndarray,
                valid: jnp.ndarray, image_hw: jnp.ndarray, k: int,
                rng: jax.Array) -> RegionFeatures:
    """Subsample <=k random valid sampled boxes per image and build
    regions with center locations normalized by the per-image valid size
    (distill_prop_mmss_gcnn.py:348-399)."""
    centers = box_ops.centers(boxes)  # [B, S, 2] (x, y)
    loc = jnp.stack([
        centers[..., 0] / jnp.maximum(image_hw[:, None, 1], 1.0),
        centers[..., 1] / jnp.maximum(image_hw[:, None, 0], 1.0)], axis=-1)
    regions = RegionFeatures(features=box_feats, mask=valid,
                             loc=loc.astype(jnp.float32))
    return spatial_dropout(regions, k, rng)


class MMSSHeads(nn.Module):
    """The dict of MMSS heads with optional shared v2l projection
    (build_mmss_heads + tying, ``mmss_heads/mmss_heads.py:29-40``)."""
    head_types: Tuple[str, ...]
    default_head: str
    tie_v2l: bool
    gcfg: GroundingConfig
    tcfg: TransformerHeadConfig
    v_dim: int
    l_dim: int

    def setup(self):
        if self.tie_v2l:
            self.v2l_projection = nn.Dense(
                self.l_dim, name="v2l_projection",
                precision=jax.lax.Precision.HIGHEST)
        heads = {}
        if "GroundingHead" in self.head_types:
            self.grounding_head = GroundingHead(
                gcfg=self.gcfg, v_dim=self.v_dim, l_dim=self.l_dim,
                external_projection=self.tie_v2l)
        if "TransformerHead" in self.head_types:
            self.transformer_head = TransformerHead(
                tcfg=self.tcfg, v_dim=self.v_dim, l_dim=self.l_dim,
                external_projection=self.tie_v2l)
        if "MLPHead" in self.head_types:
            from ..mmss.mlp_head import MLPHead
            self.mlp_head = MLPHead(
                tcfg=self.tcfg, v_dim=self.v_dim, l_dim=self.l_dim,
                external_projection=self.tie_v2l)

    def project(self, features: jnp.ndarray) -> jnp.ndarray:
        """Shared v2l projection (the detector's emb_pred aliases this
        when LOAD_EMB_PRED_FROM_MMSS_HEAD, distill_prop_mmss_gcnn.py:
        117-125)."""
        assert self.tie_v2l
        return self.v2l_projection(features)

    def __call__(self, image: RegionFeatures, caption: CaptionFeatures,
                 word_embeddings: jnp.ndarray, rng: jax.Array,
                 deterministic: bool = True,
                 image2: Optional[RegionFeatures] = None,
                 rng2: Optional[jax.Array] = None):
        """Single-group call returns (outputs, losses, dists). With
        ``image2`` (the fused grid+box MMSS pass of
        DistillProposalMMSSRCNN) the TransformerHead encodes BOTH
        groups' pair lists in one pass — per-group math identical, half
        the op dispatches at the 16-pair parity batch — and a tuple of
        two (outputs, losses, dists) triples is returned. The cheap
        GroundingHead einsums stay per-group so alignment/mining rng
        draws match the unfused path exactly."""
        groups = [(image, rng)] if image2 is None else \
            [(image, rng), (image2, rng2)]
        acc = [({}, {}, {}) for _ in groups]
        if self.tie_v2l:
            groups = [(img._replace(features=self.project(img.features)), r)
                      for img, r in groups]
        if "GroundingHead" in self.head_types:
            for (img, r), (outputs, losses, dists) in zip(groups, acc):
                _, k = jax.random.split(r)
                res = self.grounding_head(img, caption, rng=k)
                if self.gcfg.return_dist:
                    o, l, d = res
                    dists.update(d)
                else:
                    o, l = res
                outputs.update(o)
                losses.update(l)
        if "TransformerHead" in self.head_types:
            res = self.transformer_head(
                image=groups[0][0], caption=caption,
                word_embeddings=word_embeddings,
                deterministic=deterministic,
                image2=groups[1][0] if image2 is not None else None)
            res = (res,) if image2 is None else res
            for rg, (outputs, losses, dists) in zip(res, acc):
                if self.tcfg.return_dist:
                    o, l, d = rg
                    dists.update(d)
                else:
                    o, l = rg
                outputs.update(o)
                losses.update(l)
        if "MLPHead" in self.head_types:
            for (img, r), (outputs, losses, dists) in zip(groups, acc):
                res = self.mlp_head(img, caption, word_embeddings,
                                    deterministic=deterministic)
                if self.tcfg.return_dist:
                    o, l, d = res
                    dists.update(d)
                else:
                    o, l = res
                outputs.update(o)
                losses.update(l)
        if image2 is None:
            return acc[0]
        return tuple(acc)


@register_meta_arch("DistillProposalMMSSRCNN")
class DistillProposalMMSSRCNN(nn.Module):
    """The LSM flagship model."""
    # visual backbone
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
    # language / mmss
    language_type: str
    language_add_position: bool
    head_types: tuple
    default_head: str
    tie_v2l: bool
    gcfg: GroundingConfig
    tcfg: TransformerHeadConfig
    spatial_dropout_k: int
    distill_cfg: Optional[dict]
    load_emb_pred_from_mmss: bool
    compute_dtype: jnp.dtype = jnp.float32
    remat_backbone: bool = False
    freeze_at: int = 0
    use_rpn: bool = True
    grid_mmss: bool = True  # False for DistillOnlyProposalMMSSRCNN
    fused_mmss: bool = False  # TPU.FUSED_MMSS_PASSES
    lang_bert_cfg: Optional[tuple] = None  # BertConfig override (tests)

    @classmethod
    def from_cfg(cls, cfg, **overrides):
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" \
            else jnp.float32
        m = cfg.MODEL.MMSS_HEAD
        distill_cfg = None
        if m.DISTILLATION_LOSS:
            distill_cfg = dict(
                loss_type=m.DISTILLATION_LOSS_TYPE,
                temperature=m.DISTILLATION_TEMPERATURE,
                loss_weight=m.DISTILLATION_LOSS_WEIGHT,
                detach_teacher=m.DISTILLATION_DETACH_TEACHER,
                transformer_teacher=m.DISTILLATION_TEACHER_TRANSFORMER)
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
            language_type=cfg.MODEL.LANGUAGE_BACKBONE.TYPE,
            language_add_position=(
                cfg.MODEL.LANGUAGE_BACKBONE.ADD_POSITION_EMBEDDING),
            head_types=tuple(m.TYPES),
            default_head=m.DEFAULT_HEAD,
            tie_v2l=m.TIE_VL_PROJECTION_WEIGHTS,
            gcfg=GroundingConfig.from_cfg(cfg),
            tcfg=TransformerHeadConfig.from_cfg(cfg),
            spatial_dropout_k=m.SPATIAL_DROPOUT,
            distill_cfg=distill_cfg,
            load_emb_pred_from_mmss=cfg.MODEL.LOAD_EMB_PRED_FROM_MMSS_HEAD,
            compute_dtype=dtype,
            lang_bert_cfg=tuple(_lang_bert_cfg(cfg)),
            remat_backbone=cfg.TPU.REMAT_BACKBONE,
            freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
            use_rpn=(cfg.MODEL.PROPOSAL_GENERATOR.NAME
                     != 'PrecomputedProposals'),
            fused_mmss=cfg.TPU.FUSED_MMSS_PASSES)
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
            compute_dtype=self.compute_dtype)

        from ..bert import BertConfig
        from ..language import LANGUAGE_BACKBONES
        bert_cfg = (BertConfig(*self.lang_bert_cfg)
                    if self.lang_bert_cfg is not None else BertConfig())
        lang_kwargs = {"bert_cfg": bert_cfg}
        if self.language_type == "build_bertemb_backbone":
            lang_kwargs["add_position_embedding"] = \
                self.language_add_position
        self.language_backbone = LANGUAGE_BACKBONES[self.language_type](
            **lang_kwargs)

        v_dim = self.res2_out_channels * 8  # roi_heads.output_shape (2048)
        self.mmss_heads = MMSSHeads(
            head_types=self.head_types, default_head=self.default_head,
            tie_v2l=self.tie_v2l, gcfg=self.gcfg, tcfg=self.tcfg,
            v_dim=v_dim, l_dim=bert_cfg.hidden_size)

        if self.distill_cfg is not None:
            from ..mmss.distill import DISTILL_LOSSES
            d = self.distill_cfg
            fn = DISTILL_LOSSES[d["loss_type"]]
            self._distill = lambda t, w, r: fn(
                t, w, r, d["temperature"], d["loss_weight"],
                d["detach_teacher"], d["transformer_teacher"])
        else:
            self._distill = None

    # ------------------------------------------------------------- helpers
    def preprocess(self, images: ImageBatch) -> jnp.ndarray:
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        return ((images.image - mean) / std).astype(self.compute_dtype)

    def _proposals(self, features, images, gt, training, losses,
                   rng=None):
        if self.use_rpn:
            logits, deltas = self.rpn_head(features)
            logits = logits.astype(jnp.float32)
            deltas = deltas.astype(jnp.float32)
            cell = generate_cell_anchors(self.rpn_cfg.sizes,
                                         self.rpn_cfg.aspect_ratios)
            anchors = grid_anchors(cell, features.shape[1],
                                   features.shape[2], self.rpn_cfg.stride,
                                   self.rpn_cfg.offset)
            if training:
                losses.update(rpn_losses(anchors, logits, deltas, gt,
                                         self.rpn_cfg, rng))
            return select_proposals(
                anchors, jax.lax.stop_gradient(logits),
                jax.lax.stop_gradient(deltas), images.hw, self.rpn_cfg,
                training=training)
        return None

    def _predict_boxes(self, box_feats_flat, class_emb):
        """Box predictor with emb_pred optionally aliased to the shared
        mmss v2l projection."""
        if self.load_emb_pred_from_mmss and self.tie_v2l:
            emb = self.mmss_heads.project(box_feats_flat)
            return self.roi_heads.box_predictor(
                box_feats_flat, class_emb, emb_override=emb)
        return self.roi_heads.box_predictor(box_feats_flat, class_emb)

    # --------------------------------------------------------------- train
    def losses(self, batch: DetectionBatch, class_emb: jnp.ndarray,
               rng: jax.Array, deterministic: bool = True
               ) -> Tuple[Dict, Dict]:
        """Returns (mmss_outputs, losses) — the reference's tuple
        contract (distill_prop_mmss_gcnn.py:477). Training passes
        deterministic=False (+ a 'dropout' rng via apply) so the
        transformer-head/visual-embedding dropout is live, matching the
        reference's model.train() behavior."""
        images = batch.images
        gt = batch.gt
        r_rpn, r_sample, r_drop, r_box, r_heads1, r_heads2 = \
            jax.random.split(rng, 6)

        caption = self.language_backbone(batch.text, deterministic=True)
        x = self.preprocess(images)
        features = self.backbone(x)["res4"]

        losses: Dict[str, jnp.ndarray] = {}
        proposals = self._proposals(features, images, gt, True, losses,
                                    r_rpn)
        if proposals is None:
            from .ovr_rcnn import _require_proposals
            proposals = _require_proposals(batch)

        sampled = label_and_sample_proposals(proposals, gt, self.rcfg,
                                             r_sample)
        box_feats = self.roi_heads.roi_features(features, sampled.boxes)
        box_feats = box_feats.astype(jnp.float32)
        b, s, c = box_feats.shape
        scores, deltas2 = self._predict_boxes(
            box_feats.reshape(b * s, c), class_emb)
        losses.update(roi_heads_losses(
            scores.reshape(b, s, -1), deltas2.reshape(b, s, 4), sampled,
            self.pcfg))

        word_emb = self.language_backbone.word_embedding_matrix()
        mmss_outputs: Dict[str, jnp.ndarray] = {}
        dists: Dict[str, jnp.ndarray] = {}

        regions = None
        if self.grid_mmss:
            grid = self.roi_heads.grid_features(features)
            grid = grid.astype(jnp.float32)
            regions = make_grid_regions(grid, images.hw,
                                        (x.shape[1], x.shape[2]))
            if self.spatial_dropout_k > 0:
                regions = spatial_dropout(regions, self.spatial_dropout_k,
                                          r_drop)

        # box MMSS pass over <=spatial_dropout random sampled boxes
        k = self.spatial_dropout_k if self.spatial_dropout_k > 0 else s
        bregions = box_regions(sampled.boxes, box_feats, sampled.valid,
                               images.hw.astype(jnp.float32), k, r_box)

        # Fuse the grid and box passes into ONE mmss_heads invocation
        # when the region counts match (they do at the parity config:
        # SPATIAL_DROPOUT caps both at 100): the 6-layer joint encoder,
        # pooler and MLM decoder each run once over both groups' pair
        # lists — identical per-group math, half the op dispatches.
        fused = (self.fused_mmss and regions is not None
                 and "TransformerHead" in self.head_types
                 and regions.mask.shape == bregions.mask.shape)
        if fused:
            (og, lg, dg), (o, l, d) = self.mmss_heads(
                regions, caption, word_emb, r_heads1,
                deterministic=deterministic, image2=bregions,
                rng2=r_heads2)
            mmss_outputs.update(og)
            losses.update(lg)
            dists.update(dg)
        else:
            if regions is not None:
                og, lg, dg = self.mmss_heads(
                    regions, caption, word_emb, r_heads1,
                    deterministic=deterministic)
                mmss_outputs.update(og)
                losses.update(lg)
                dists.update(dg)
            o, l, d = self.mmss_heads(bregions, caption, word_emb,
                                      r_heads2,
                                      deterministic=deterministic)
        mmss_outputs.update({"Box " + k2: v for k2, v in o.items()})
        losses.update({"Box " + k2: v for k2, v in l.items()})
        dists.update({"box_" + k2: v for k2, v in d.items()})

        if self._distill is not None:
            if self.grid_mmss:
                losses["kd_loss"] = self._distill(
                    dists["trans"], dists["w2r"], dists["r2w"])
            losses["box_kd_loss"] = self._distill(
                dists["box_trans"], dists["box_w2r"], dists["box_r2w"])
            if self.grid_mmss:
                losses["mixbox_kd_loss"] = self._distill(
                    dists["trans"], dists["box_w2r"], dists["box_r2w"])

        return mmss_outputs, losses

    # ----------------------------------------------------------- inference
    def inference(self, batch: DetectionBatch,
                  class_emb: jnp.ndarray) -> Detections:
        images = batch.images
        x = self.preprocess(images)
        features = self.backbone(x)["res4"]
        proposals = self._proposals(features, images, None, False, {})
        if proposals is None:
            from .ovr_rcnn import _require_proposals
            proposals = _require_proposals(batch)
        box_feats = self.roi_heads.roi_features(features, proposals.boxes)
        box_feats = box_feats.astype(jnp.float32)
        b, s, c = box_feats.shape
        scores, deltas2 = self._predict_boxes(
            box_feats.reshape(b * s, c), class_emb)
        dets = fast_rcnn_inference_batched(
            scores.reshape(b, s, -1), deltas2.reshape(b, s, 4),
            proposals.boxes, proposals.mask, images.hw, self.pcfg)
        scale = images.orig_hw.astype(jnp.float32) / \
            images.hw.astype(jnp.float32)
        boxes = box_ops.scale(dets.boxes, scale[:, None, 1],
                              scale[:, None, 0])
        boxes = jax.vmap(box_ops.clip)(boxes, images.orig_hw)
        return dets._replace(boxes=boxes)


@register_meta_arch("DistillOnlyProposalMMSSRCNN")
class DistillOnlyProposalMMSSRCNN(DistillProposalMMSSRCNN):
    """Box-MMSS-only variant (distill_prop_mmss_gcnn.py:562-710)."""

    @classmethod
    def from_cfg(cls, cfg, **overrides):
        overrides.setdefault("grid_mmss", False)
        return super().from_cfg(cfg, **overrides)


@register_meta_arch("MMSSGridModel")
class MMSSGridModel(nn.Module):
    """Proposal-free grid matching model (mmss_gcnn.py:22-192): backbone
    grid (res4; res5 via an extra stage when IN_FEATURES == 'res5') ->
    spatial dropout -> MMSS heads. No detector, no RPN."""
    depth: int
    num_groups: int
    width_per_group: int
    stem_out_channels: int
    res2_out_channels: int
    stride_in_1x1: bool
    pixel_mean: tuple
    pixel_std: tuple
    in_features: str
    language_type: str
    language_add_position: bool
    head_types: tuple
    default_head: str
    tie_v2l: bool
    gcfg: GroundingConfig
    tcfg: TransformerHeadConfig
    spatial_dropout_k: int
    distill_cfg: Optional[dict] = None
    compute_dtype: jnp.dtype = jnp.float32
    remat_backbone: bool = False
    freeze_at: int = 0
    lang_bert_cfg: Optional[tuple] = None  # BertConfig override (tests)

    @classmethod
    def from_cfg(cls, cfg, **overrides):
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" \
            else jnp.float32
        m = cfg.MODEL.MMSS_HEAD
        distill_cfg = None
        if m.DISTILLATION_LOSS:
            distill_cfg = dict(
                loss_type=m.DISTILLATION_LOSS_TYPE,
                temperature=m.DISTILLATION_TEMPERATURE,
                loss_weight=m.DISTILLATION_LOSS_WEIGHT,
                detach_teacher=m.DISTILLATION_DETACH_TEACHER,
                transformer_teacher=m.DISTILLATION_TEACHER_TRANSFORMER)
        kw = dict(
            depth=cfg.MODEL.RESNETS.DEPTH,
            num_groups=cfg.MODEL.RESNETS.NUM_GROUPS,
            width_per_group=cfg.MODEL.RESNETS.WIDTH_PER_GROUP,
            stem_out_channels=cfg.MODEL.RESNETS.STEM_OUT_CHANNELS,
            res2_out_channels=cfg.MODEL.RESNETS.RES2_OUT_CHANNELS,
            stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            in_features=m.IN_FEATURES,
            language_type=cfg.MODEL.LANGUAGE_BACKBONE.TYPE,
            language_add_position=(
                cfg.MODEL.LANGUAGE_BACKBONE.ADD_POSITION_EMBEDDING),
            head_types=tuple(m.TYPES),
            default_head=m.DEFAULT_HEAD,
            tie_v2l=m.TIE_VL_PROJECTION_WEIGHTS,
            gcfg=GroundingConfig.from_cfg(cfg),
            tcfg=TransformerHeadConfig.from_cfg(cfg),
            spatial_dropout_k=m.SPATIAL_DROPOUT,
            distill_cfg=distill_cfg,
            compute_dtype=dtype,
            lang_bert_cfg=tuple(_lang_bert_cfg(cfg)),
            remat_backbone=cfg.TPU.REMAT_BACKBONE,
            freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT)
        kw.update(overrides)
        return cls(**kw)

    def setup(self):
        out_feats = ("res4",) if self.in_features == "res4" \
            else ("res4", "res5")
        self.backbone = ResNetC4(
            depth=self.depth, out_features=out_feats,
            num_groups=self.num_groups,
            width_per_group=self.width_per_group,
            stem_out_channels=self.stem_out_channels,
            res2_out_channels=self.res2_out_channels,
            stride_in_1x1=self.stride_in_1x1,
            compute_dtype=self.compute_dtype,
            remat=self.remat_backbone,
            freeze_at=self.freeze_at)
        from ..bert import BertConfig
        from ..language import LANGUAGE_BACKBONES
        bert_cfg = (BertConfig(*self.lang_bert_cfg)
                    if self.lang_bert_cfg is not None else BertConfig())
        lang_kwargs = {"bert_cfg": bert_cfg}
        if self.language_type == "build_bertemb_backbone":
            lang_kwargs["add_position_embedding"] = \
                self.language_add_position
        self.language_backbone = LANGUAGE_BACKBONES[self.language_type](
            **lang_kwargs)
        v_dim = self.res2_out_channels * (8 if self.in_features == "res5"
                                          else 4)
        self.mmss_heads = MMSSHeads(
            head_types=self.head_types, default_head=self.default_head,
            tie_v2l=self.tie_v2l, gcfg=self.gcfg, tcfg=self.tcfg,
            v_dim=v_dim, l_dim=bert_cfg.hidden_size)
        if self.distill_cfg is not None:
            from ..mmss.distill import DISTILL_LOSSES
            d = self.distill_cfg
            fn = DISTILL_LOSSES[d["loss_type"]]
            self._distill = lambda t, w, r: fn(
                t, w, r, d["temperature"], d["loss_weight"],
                d["detach_teacher"], d["transformer_teacher"])
        else:
            self._distill = None

    def losses(self, batch: DetectionBatch, class_emb, rng: jax.Array,
               deterministic: bool = True):
        images = batch.images
        r_drop, r_heads = jax.random.split(rng)
        caption = self.language_backbone(batch.text, deterministic=True)
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        x = ((images.image - mean) / std).astype(self.compute_dtype)
        feats = self.backbone(x)[self.in_features].astype(jnp.float32)
        regions = make_grid_regions(feats, images.hw,
                                    (x.shape[1], x.shape[2]))
        if self.spatial_dropout_k > 0:
            regions = spatial_dropout(regions, self.spatial_dropout_k,
                                      r_drop)
        word_emb = self.language_backbone.word_embedding_matrix()
        outputs, losses, dists = self.mmss_heads(
            regions, caption, word_emb, r_heads,
            deterministic=deterministic)
        if self._distill is not None:
            losses["kd_loss"] = self._distill(
                dists["trans"], dists["w2r"], dists["r2w"])
        return outputs, losses


@register_meta_arch("DistillMMSSGridModel")
class DistillMMSSGridModel(MMSSGridModel):
    """Grid model + distillation (distill_mmss_gcnn.py:21-209); the
    distill loss is active whenever DISTILLATION_LOSS is set, which
    from_cfg already wires."""
    pass

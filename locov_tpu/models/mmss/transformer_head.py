"""TransformerHead: multimodal BERT-style encoder with MLM + matching.

Behavioral port of the reference
(``ovr/modeling/mmss_heads/transformer_head.py:21-307``): projected
region features + location embeddings are concatenated with caption
token embeddings; a small BERT encoder (6L/8H in coco_lsm.yaml) encodes
every (caption, image) pair in the batch; the pooled [CLS] state scores
pair matching (bi_seq_relationship[:, 0] -> BxB cost, :208-215) and the
diagonal pairs' token states drive masked-language-modeling CE
(:187-206). TPU restructurings:

- pair construction is index-gather (no BxB .repeat() materialization
  of embeddings; only the joint sequence tensor is BxB),
- the MLM decoder (hidden x 30522 vocab matmul) runs ONLY on the B
  diagonal pairs instead of all B^2 (the reference computes all and
  then takes the diagonal, transformer_head.py:188-194 — identical
  math, ~B'x fewer FLOPs on the largest matmul),
- the unused image-prediction head is skipped when MVM_LOSS == ''
  (the reference computes it then freezes its params, :49-57),
- optional chunking over caption rows keeps the B^2 encoder pass
  inside a bounded-memory lax.map,
- the grid-MMSS and box-MMSS passes of DistillProposalMMSSRCNN can be
  FUSED into one encoder call (``image2=``): at the parity batch the
  per-pass encoder runs only 16 sequences, far below MXU saturation,
  so one 32-pair pass halves the op count for identical math (the two
  region sets never attend to each other — pair construction is still
  per-group; only the batch dimension is shared). Loss values are
  bitwise-identical per group up to dropout-draw order.
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...structures.batches import CaptionFeatures, RegionFeatures
from ..bert import (BertConfig, BertEncoder, BertLMHead, BertPooler,
                    _dense)


class TransformerHeadConfig(NamedTuple):
    bert: BertConfig
    mlm: bool = True
    mlm_validation: bool = True
    mvm_loss: str = ""
    mmm_loss: str = "cross_entropy"
    return_dist: bool = False
    pairwise_chunk: int = 0
    # False (default) reproduces the reference verbatim: the raw 0/1
    # attention mask is ADDED to the pre-softmax logits (vilbert-
    # lineage quirk at transformer_head.py:170-176 — padded caption/
    # region slots are only 1 logit below valid ones, so attention
    # leaks to padding). True applies the standard (1-m)*-inf mask —
    # a documented improvement, but off for behavioral parity with
    # reference-trained checkpoints.
    proper_attention_mask: bool = False

    @classmethod
    def from_cfg(cls, cfg):
        t = cfg.MODEL.MMSS_HEAD.TRANSFORMER
        import jax.numpy as jnp
        bert = BertConfig.from_cfg_node(t.BERT_CONFIG)
        if cfg.TPU.COMPUTE_DTYPE == "bfloat16":
            # run the (BxB-replicated) multimodal encoder's matmuls on
            # the bf16 MXU path; LayerNorm/softmax still accumulate f32
            bert = bert._replace(dtype=jnp.bfloat16)
        return cls(
            bert=bert,
            mlm=t.MASKED_LANGUAGE_MODELING,
            mlm_validation=t.MASKED_LANGUAGE_MODELING_VALIDATION,
            mvm_loss=t.MVM_LOSS,
            mmm_loss=t.MMM_LOSS,
            return_dist=cfg.MODEL.MMSS_HEAD.DISTILLATION_LOSS,
            pairwise_chunk=cfg.TPU.PAIRWISE_CHUNK,
            proper_attention_mask=t.PROPER_ATTENTION_MASK)


class VisualEmbedding(nn.Module):
    """linear(img) + linear(loc) -> LN -> dropout
    (transformer_head.py:284-303)."""
    cfg: BertConfig

    @nn.compact
    def __call__(self, features, loc, deterministic=True):
        img = _dense(self.cfg, self.cfg.hidden_size,
                     "image_embeddings")(features)
        pos = _dense(self.cfg, self.cfg.hidden_size,
                     "image_location_embeddings")(loc)
        x = nn.LayerNorm(epsilon=1e-12, name="norm")(img + pos)
        return nn.Dropout(self.cfg.hidden_dropout_prob)(
            x, deterministic=deterministic)


class _PairChunkEncoder(nn.Module):
    """One chunk of the BxB pairwise joint-encoder pass, written as a
    scannable module: carry holds the (broadcast) caption/region
    embeddings, xs holds this chunk's pair indices. Used via
    nn.scan + nn.share_scope so the encoder/pooler params live at the
    SAME scope names as the unchunked path (checkpoint compatible, and
    chunking stays a pure memory knob)."""
    cfg: BertConfig
    deterministic: bool = True
    raw_additive_mask: bool = True

    @nn.compact
    def __call__(self, carry, xs):
        cap_e, img_e, cap_m, reg_m = carry
        cix, iix = xs
        tokens = jnp.concatenate([cap_e[cix], img_e[iix]], axis=1)
        mask = jnp.concatenate([cap_m[cix], reg_m[iix]], axis=1)
        seq = BertEncoder(self.cfg, name="encoder")(
            tokens, mask, deterministic=self.deterministic,
            raw_additive_mask=self.raw_additive_mask)
        pooled = BertPooler(self.cfg, name="pooler")(seq)
        return carry, (seq, pooled)


class TransformerHead(nn.Module):
    tcfg: TransformerHeadConfig
    v_dim: int
    l_dim: int
    loc_dim: int = 2
    external_projection: bool = False

    @nn.compact
    def __call__(self, image: RegionFeatures, caption: CaptionFeatures,
                 word_embeddings: jnp.ndarray,
                 deterministic: bool = True,
                 image2: RegionFeatures = None):
        """With ``image2`` (the fused grid+box MMSS pass) both region
        groups ride ONE encoder/LM-head invocation; returns a tuple of
        two (other, losses[, dists]) results, one per group."""
        t = self.tcfg
        c = t.bert
        caption_emb = caption.encoded_tokens          # [B, W, D]
        caption_mask = caption.attention_mask.astype(jnp.float32)
        target_ids = jnp.where(caption.mlm_mask > 0, caption.target_ids, -1)
        raw_mask = not t.proper_attention_mask

        b, max_w = caption_mask.shape
        ng = 1 if image2 is None else 2
        if ng == 2:
            assert image.mask.shape == image2.mask.shape, (
                "fused MMSS pass needs equal region counts, got "
                f"{image.mask.shape} vs {image2.mask.shape}")
            feats = jnp.concatenate([image.features, image2.features], 0)
            locs = jnp.concatenate([image.loc, image2.loc], 0)
            rmask = jnp.concatenate([image.mask, image2.mask], 0)
        else:
            feats, locs, rmask = image.features, image.loc, image.mask
        max_r = rmask.shape[1]

        if self.external_projection:
            image_emb = feats
        else:
            image_emb = nn.Dense(self.l_dim, name="v2l_projection")(feats)
        image_emb = VisualEmbedding(c, name="visual_emb")(
            image_emb, locs, deterministic)        # [ng*B, R, D]
        region_mask = rmask.astype(jnp.float32)

        encoder = BertEncoder(c, name="encoder")
        pooler = BertPooler(c, name="pooler")
        bi_seq = _dense(c, 2, "bi_seq_relationship")

        if t.mmm_loss == "cross_entropy":
            # all BxB (caption, image) joint sequences; gather indices
            # instead of repeating the underlying embeddings. With two
            # fused groups the pair list is the two groups' BxB lists
            # back to back (group g's image row i lives at g*B + i).
            base_cap = jnp.repeat(jnp.arange(b), b)  # pair k: caption k//b
            base_img = jnp.tile(jnp.arange(b), b)    # pair k: image  k%b
            cap_idx = jnp.tile(base_cap, ng)
            img_idx = jnp.concatenate(
                [base_img + g * b for g in range(ng)])
            npairs = ng * b * b

            def encode_pairs(ci, ii):
                tokens = jnp.concatenate(
                    [caption_emb[ci], image_emb[ii]], axis=1)
                mask = jnp.concatenate(
                    [caption_mask[ci], region_mask[ii]], axis=1)
                seq = encoder(tokens, mask, deterministic=deterministic,
                              raw_additive_mask=raw_mask)
                pooled = pooler(seq)
                return seq, pooled

            if t.pairwise_chunk and t.pairwise_chunk < npairs:
                # sequential chunks bound peak memory of the pairwise
                # encoder pass; params broadcast across iterations.
                # nn.remat makes the bound REAL under grad: without it
                # every chunk's encoder residuals (attention probs,
                # FFN activations) stay live across the whole scan, so
                # chunking bounded only the forward intermediates —
                # measured 49.5 GB (OOM) for 1024 pairs fwd+bwd on a
                # 16 GB v5e without remat. Recompute costs one extra
                # forward of the encoder per chunk.
                nchunk = npairs // t.pairwise_chunk
                ci = cap_idx.reshape(nchunk, -1)
                ii = img_idx.reshape(nchunk, -1)
                scan_cls = nn.scan(
                    nn.remat(_PairChunkEncoder,
                             prevent_cse=False,
                             static_argnums=()),
                    variable_broadcast="params",
                    split_rngs={"params": False, "dropout": True},
                    in_axes=0, out_axes=0)
                pe = scan_cls(c, deterministic, raw_mask)
                nn.share_scope(self, pe)
                carry = (caption_emb, image_emb, caption_mask,
                         region_mask)
                _, (seq_out, pooled) = pe(carry, (ci, ii))
                seq_out = seq_out.reshape((npairs,) + seq_out.shape[2:])
                pooled = pooled.reshape(npairs, -1)
            else:
                seq_out, pooled = encode_pairs(cap_idx, img_idx)

            scores = bi_seq(pooled)                      # [ng*B*B, 2]
            pw_costs = [scores[g * b * b:(g + 1) * b * b, 0].reshape(b, b)
                        for g in range(ng)]
            # MLM on diagonal pairs only (identical to taking the
            # diagonal of the full [B, B, W, V] tensor)
            diag = jnp.arange(b) * b + jnp.arange(b)
            diag_all = jnp.concatenate(
                [diag + g * b * b for g in range(ng)])
            seq_t_diag = seq_out[diag_all, :max_w]       # [ng*B, W, D]
        elif t.mmm_loss == "":
            tokens = jnp.concatenate(
                [jnp.tile(caption_emb, (ng, 1, 1)), image_emb], axis=1)
            mask = jnp.concatenate(
                [jnp.tile(caption_mask, (ng, 1)), region_mask], axis=1)
            seq = encoder(tokens, mask, deterministic=deterministic,
                          raw_additive_mask=raw_mask)
            pw_costs = [None] * ng
            seq_t_diag = seq[:, :max_w]                  # [ng*B, W, D]
        else:
            raise NotImplementedError(t.mmm_loss)

        # ONE tied-decoder matmul over both groups' diagonal pairs
        lm_logits_all = BertLMHead(c, name="predictions")(
            seq_t_diag, word_embeddings)                 # [ng*B, W, V]
        from ...ops.losses import mean_cross_entropy

        results = []
        for g in range(ng):
            lm_logits = lm_logits_all[g * b:(g + 1) * b]
            masked_lm_loss = mean_cross_entropy(lm_logits, target_ids,
                                                ignore_index=-1)
            losses: Dict[str, jnp.ndarray] = {
                "Masked Language Modeling Loss": masked_lm_loss}
            other: Dict[str, jnp.ndarray] = {}

            acc_num = ((lm_logits.argmax(-1) == target_ids)
                       & (target_ids >= 0)).sum().astype(jnp.float32)
            acc_den = (target_ids >= 0).sum().astype(jnp.float32)
            other["Masked Language Modeling Accuracy"] = jnp.where(
                acc_den > 0, acc_num / jnp.maximum(acc_den, 1.0), 0.0)

            pw_cost = pw_costs[g]
            if t.mmm_loss == "cross_entropy":
                lc = jax.nn.log_softmax(-pw_cost, axis=0)
                li = jax.nn.log_softmax(-pw_cost, axis=1)
                losses["Image Caption Matching Loss"] = (
                    -jnp.diagonal(lc).mean() - jnp.diagonal(li).mean())
                arange = jnp.arange(b)
                other["Batch Accuracy (Choose Caption)"] = \
                    (pw_cost.argmin(axis=0) == arange).mean()
                other["Batch Accuracy (Choose Image)"] = \
                    (pw_cost.argmin(axis=1) == arange).mean()
            else:
                losses["Image Caption Matching Loss"] = jnp.float32(0.0)

            if t.return_dist:
                results.append((other, losses, {"trans": pw_cost}))
            else:
                results.append((other, losses))

        if image2 is None:
            return results[0]
        return tuple(results)

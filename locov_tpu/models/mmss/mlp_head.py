"""MLPHead: attention-free multimodal matching head.

The reference registers an ``MLPHead`` (a near-copy of TransformerHead
with a leftover ``ipdb.set_trace()`` that makes it unusable —
``ovr/modeling/mmss_heads/mlp_head.py:42``, SURVEY.md §2a#16). This is
a working equivalent: per-token MLP encoding (no attention) of the
joint [caption ; regions] sequence, masked mean-pool for the pair
matching score, and MLM over caption positions — the same loss surface
as TransformerHead at a fraction of the FLOPs.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.losses import mean_cross_entropy
from ...structures.batches import CaptionFeatures, RegionFeatures
from ..bert import BertLMHead, _dense
from .transformer_head import TransformerHeadConfig, VisualEmbedding


class MLPHead(nn.Module):
    tcfg: TransformerHeadConfig
    v_dim: int
    l_dim: int
    loc_dim: int = 2
    external_projection: bool = False

    @nn.compact
    def __call__(self, image: RegionFeatures, caption: CaptionFeatures,
                 word_embeddings: jnp.ndarray,
                 deterministic: bool = True):
        t = self.tcfg
        c = t.bert
        caption_emb = caption.encoded_tokens
        caption_mask = caption.attention_mask.astype(jnp.float32)
        target_ids = jnp.where(caption.mlm_mask > 0, caption.target_ids,
                               -1)
        b = caption_mask.shape[0]

        if self.external_projection:
            image_emb = image.features
        else:
            image_emb = nn.Dense(self.l_dim, name="v2l_projection")(
                image.features)
        image_emb = VisualEmbedding(c, name="visual_emb")(
            image_emb, image.loc, deterministic)
        region_mask = image.mask.astype(jnp.float32)

        def encode(tokens):
            h = _dense(c, c.intermediate_size, "mlp_in")(tokens)
            h = nn.gelu(h, approximate=False)
            h = _dense(c, c.hidden_size, "mlp_out")(h)
            return nn.LayerNorm(epsilon=c.layer_norm_eps,
                                name="mlp_norm")(h + tokens)

        seq_t = encode(caption_emb)             # [B, W, D]
        seq_v = encode(image_emb)               # [B, R, D]

        losses: Dict[str, jnp.ndarray] = {}
        other: Dict[str, jnp.ndarray] = {}

        lm_logits = BertLMHead(c, name="predictions")(seq_t,
                                                      word_embeddings)
        losses["Masked Language Modeling Loss"] = mean_cross_entropy(
            lm_logits, target_ids, ignore_index=-1)
        acc_num = ((lm_logits.argmax(-1) == target_ids)
                   & (target_ids >= 0)).sum().astype(jnp.float32)
        acc_den = (target_ids >= 0).sum().astype(jnp.float32)
        other["Masked Language Modeling Accuracy"] = jnp.where(
            acc_den > 0, acc_num / jnp.maximum(acc_den, 1.0), 0.0)

        if t.mmm_loss == "cross_entropy":
            # pooled caption / image embeddings -> all-pairs cost
            cap_pool = (seq_t * caption_mask[..., None]).sum(1) / \
                jnp.maximum(caption_mask.sum(1, keepdims=True), 1.0)
            img_pool = (seq_v * region_mask[..., None]).sum(1) / \
                jnp.maximum(region_mask.sum(1, keepdims=True), 1.0)
            score = _dense(c, c.hidden_size, "match_proj")(cap_pool)
            pw_cost = -jnp.einsum(
                "cd,id->ci", score, img_pool,
                precision=jax.lax.Precision.HIGHEST)
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
            pw_cost = None
            losses["Image Caption Matching Loss"] = jnp.float32(0.0)

        if t.return_dist:
            return other, losses, {"trans": pw_cost}
        return other, losses

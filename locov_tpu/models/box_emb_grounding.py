"""Multi-token grounding box classifier.

Port of the reference's ``GroundingModule`` /
``EmbeddingGroundingFastRCNNOutputLayers``
(``ovr/modeling/roi_heads/box_emb_grounding_head.py:60-434``): class
names may tokenize to several BERT tokens; a region scores a class by
aligning its embedding to the class's token set (softmax/hardmax over
tokens), then summing aligned local distances — the boxed-down version
of the grounding head's word-region alignment. NB: the reference path
is latent-broken (it reads the never-defined
``cfg.MODEL.ROI_HEADS.MAX_TOKENS``, box_emb_grounding_head.py:355 —
SURVEY.md §2a#13); here it is functional, with the class token tensor
as an explicit input.

Static layout: ``class_tokens`` [K+1, T, D] padded per-class token
embeddings with ``token_mask`` [K+1, T] (background = single zero
token), replacing the reference's ragged split/cat bookkeeping
(box_emb_grounding_head.py:122-148, 216-256).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.losses import normalize_vec


class ClassTokenEmbeddings(NamedTuple):
    tokens: jnp.ndarray  # [K+1, T, D]
    mask: jnp.ndarray    # [K+1, T] (>=1 valid token per class)

    @classmethod
    def from_ragged(cls, per_class_embs, emb_dim, background_class=True):
        """per_class_embs: list of [t_k, D] arrays (one per class)."""
        import numpy as np
        k = len(per_class_embs) + (1 if background_class else 0)
        t = max(max((len(e) for e in per_class_embs), default=1), 1)
        tokens = np.zeros((k, t, emb_dim), np.float32)
        mask = np.zeros((k, t), np.float32)
        for i, e in enumerate(per_class_embs):
            e = np.asarray(e, np.float32).reshape(-1, emb_dim)
            tokens[i, :len(e)] = e
            mask[i, :len(e)] = 1.0
        if background_class:
            mask[-1, 0] = 1.0  # single zero token
        return cls(jnp.asarray(tokens), jnp.asarray(mask))


def grounding_class_scores(region_emb: jnp.ndarray,
                           class_tokens: ClassTokenEmbeddings,
                           local_metric: str = "dot",
                           alignment: str = "softmax",
                           temperature: float = 1.0,
                           normalize_emb: bool = False) -> jnp.ndarray:
    """[N, D] regions x [K+1, T, D] class tokens -> [N, K+1] scores
    (= -global_dist, box_emb_grounding_head.py:185-214)."""
    emb = normalize_vec(region_emb) if normalize_emb else region_emb
    toks = class_tokens.tokens
    if local_metric == "cosine":
        toks = normalize_vec(toks)
    sim = jnp.einsum("nd,ktd->nkt", emb, toks,
                     precision=jax.lax.Precision.HIGHEST)
    if local_metric == "cosine":
        sim = jnp.where(jnp.isnan(sim), 0.0, sim)
        dist = (1.0 - sim) / temperature
    else:
        dist = -sim / temperature
    sim = sim / temperature

    masked_sim = jnp.where(class_tokens.mask[None] > 0, sim,
                           jax.lax.stop_gradient(sim.min()) - 100.0)
    if alignment == "softmax":
        attn = jax.nn.softmax(masked_sim, axis=2)
    elif alignment == "hardmax":
        idx = jnp.argmax(masked_sim, axis=2)
        attn = jax.nn.one_hot(idx, sim.shape[2], dtype=sim.dtype)
    else:
        raise NotImplementedError(alignment)

    attn = attn * class_tokens.mask[None]
    global_dist = (attn * dist).sum(axis=2)  # [N, K+1]
    has_tok = class_tokens.mask.sum(axis=1) > 0
    global_dist = jnp.where(
        has_tok[None], global_dist,
        jax.lax.stop_gradient(global_dist.max()) + 100.0)
    return -global_dist


class EmbeddingGroundingBoxPredictor(nn.Module):
    """Drop-in alternative to EmbeddingBoxPredictor: cls scores come
    from token-level grounding instead of a single dot product. Selected
    via MODEL.ROI_BOX_HEAD.NAME = 'EmbeddingGroundingFastRCNNOutputLayers'."""
    emb_dim: int
    local_metric: str = "dot"
    alignment: str = "softmax"
    temperature: float = 1.0
    normalize_emb: bool = False
    detach_cls_predictor: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 class_tokens: ClassTokenEmbeddings
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        deltas = nn.Dense(4, kernel_init=nn.initializers.normal(0.001),
                          name="bbox_pred")(x)
        cls_in = jax.lax.stop_gradient(x) if self.detach_cls_predictor \
            else x
        emb = nn.Dense(self.emb_dim,
                       kernel_init=nn.initializers.normal(0.01),
                       name="emb_pred")(cls_in)
        lead = emb.shape[:-1]
        scores = grounding_class_scores(
            emb.reshape(-1, emb.shape[-1]), class_tokens,
            self.local_metric, self.alignment, self.temperature,
            self.normalize_emb)
        scores = scores.reshape(lead + scores.shape[-1:])
        if self.detach_cls_predictor:
            scores = jax.lax.stop_gradient(scores)
        return scores, deltas

"""GroundingHead: localized word-region contrastive matching.

Behavioral port of the reference
(``ovr/modeling/mmss_heads/grounding_head.py:50-392``) with one key
TPU-native restructuring: instead of replicating embeddings BxB times
(grounding_head.py:116-144, the reference's memory hot spot) the
all-pairs local similarity is a single einsum

    sim[c, i, w, r] = caption_emb[c, w, :] . image_emb[i, r, :] / T

so the BxB pairwise cost matrix comes out of one fused contraction.
Semantics preserved: masked-min-minus-100 fill for invalid word/region
pairs (:156-160), softmax/hardmax/random alignments (:162-205),
aligned_local / reconstruction_mse global metrics (:212-238),
cross_entropy / triplet losses over the BxB cost (:258-352), batch
accuracies (:354-379), and the (w2r, r2w) distributions returned for
distillation (:384-386).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...structures.batches import CaptionFeatures, RegionFeatures


class GroundingConfig(NamedTuple):
    local_metric: str = "dot"
    global_metric: str = "aligned_local"
    alignment: str = "softmax"
    temperature: float = 10.0
    loss_type: str = "cross_entropy"
    negative_mining: str = "random"
    margin: float = 1.0
    align_words: bool = True
    align_regions: bool = True
    text_input: str = "input_embeddings"
    return_dist: bool = False

    @classmethod
    def from_cfg(cls, cfg):
        g = cfg.MODEL.MMSS_HEAD.GROUNDING
        return cls(
            local_metric=g.LOCAL_METRIC,
            global_metric=g.GLOBAL_METRIC,
            alignment=g.ALIGNMENT,
            temperature=g.ALIGNMENT_TEMPERATURE,
            loss_type=g.LOSS,
            negative_mining=g.NEGATIVE_MINING,
            margin=g.TRIPLET_MARGIN,
            align_words=g.ALIGN_WORDS_TO_REGIONS,
            align_regions=g.ALIGN_REGIONS_TO_WORDS,
            text_input=g.TEXT_INPUT,
            return_dist=cfg.MODEL.MMSS_HEAD.DISTILLATION_LOSS)


def _one_hot_argmax(x, axis):
    idx = jnp.argmax(x, axis=axis)
    return jax.nn.one_hot(idx, x.shape[axis], axis=axis, dtype=x.dtype)


def _remove_diag(mat: jnp.ndarray, dim: int) -> jnp.ndarray:
    """NxN -> Nx(N-1) (dim=1) or (N-1)xN (dim=0), dropping the diagonal
    (reference remove_diag, grounding_head.py:31-47)."""
    n = mat.shape[0]
    mask = ~jnp.eye(n, dtype=bool)
    if dim == 1:
        return mat[mask].reshape(n, n - 1)
    return mat.T[mask].reshape(n, n - 1).T


class GroundingHead(nn.Module):
    gcfg: GroundingConfig
    v_dim: int
    l_dim: int
    # if True, region features arrive already projected by a shared
    # v2l_projection owned by the meta-arch (TIE_VL_PROJECTION_WEIGHTS)
    external_projection: bool = False

    @nn.compact
    def __call__(self, image: RegionFeatures, caption: CaptionFeatures,
                 rng: Optional[jax.Array] = None):
        g = self.gcfg
        caption_emb = getattr(caption, g.text_input)  # [B, W, D]
        caption_mask = (caption.attention_mask *
                        (1 - caption.special_tokens_mask)).astype(jnp.float32)
        num_words = caption_mask.sum(axis=1)  # [B]

        region_mask = image.mask.astype(jnp.float32)  # [B, R]
        num_regions = region_mask.sum(axis=1)
        b, max_r = region_mask.shape
        max_w = caption_mask.shape[1]

        if self.external_projection:
            image_emb = image.features
        else:
            image_emb = nn.Dense(self.l_dim, name="v2l_projection",
                                 precision=jax.lax.Precision.HIGHEST)(
                image.features)  # [B, R, D]

        # all-pairs local similarity: [cap, img, w, r]. HIGHEST: this
        # contraction is tiny next to the backbone but its output drives
        # softmax temperature-scaled losses where bf16 noise is visible.
        sim = jnp.einsum("cwd,ird->ciwr", caption_emb, image_emb,
                         precision=jax.lax.Precision.HIGHEST)
        sim = sim / g.temperature
        if g.local_metric != "dot":
            raise NotImplementedError(g.local_metric)

        pair_mask = (caption_mask[:, None, :, None]
                     * region_mask[None, :, None, :]) > 0
        fill = jax.lax.stop_gradient(sim.min()) - 100.0
        sim = jnp.where(pair_mask, sim, fill)
        dist = -sim

        attn_w2r = attn_r2w = None
        if g.alignment == "softmax":
            if g.align_words:
                attn_w2r = jax.nn.softmax(sim, axis=3)
            if g.align_regions:
                attn_r2w = jax.nn.softmax(sim, axis=2)
        elif g.alignment == "hardmax":
            if g.align_words:
                attn_w2r = _one_hot_argmax(sim, 3)
            if g.align_regions:
                attn_r2w = _one_hot_argmax(sim, 2)
        elif g.alignment == "random_categorical":
            assert rng is not None
            k1, k2 = jax.random.split(rng)
            if g.align_words:
                idx = jax.random.categorical(k1, sim, axis=3)
                attn_w2r = jax.nn.one_hot(idx, max_r, axis=3, dtype=sim.dtype)
            if g.align_regions:
                idx = jax.random.categorical(k2, sim.swapaxes(2, 3), axis=3)
                attn_r2w = jax.nn.one_hot(
                    idx, max_w, axis=3, dtype=sim.dtype).swapaxes(2, 3)
        elif g.alignment == "random_top3":
            assert rng is not None
            k1, k2 = jax.random.split(rng)
            if g.align_words:
                _, top_idx = jax.lax.top_k(sim, 3)  # over last axis (r)
                three_hot = jax.nn.one_hot(top_idx, max_r,
                                           dtype=sim.dtype).sum(axis=3)
                idx = jax.random.categorical(k1, jnp.log(three_hot + 1e-20),
                                             axis=3)
                attn_w2r = jax.nn.one_hot(idx, max_r, axis=3, dtype=sim.dtype)
            if g.align_regions:
                simT = sim.swapaxes(2, 3)
                _, top_idx = jax.lax.top_k(simT, 3)
                three_hot = jax.nn.one_hot(top_idx, max_w,
                                           dtype=sim.dtype).sum(axis=3)
                idx = jax.random.categorical(k2, jnp.log(three_hot + 1e-20),
                                             axis=3)
                attn_r2w = jax.nn.one_hot(
                    idx, max_w, axis=3, dtype=sim.dtype).swapaxes(2, 3)
        else:
            raise NotImplementedError(g.alignment)

        ones = jnp.ones_like(num_words)
        nw = jnp.maximum(num_words, ones)[:, None]     # [cap, 1]
        nr = jnp.maximum(num_regions, ones)[None, :]   # [1, img]

        if g.global_metric == "aligned_local":
            if g.align_words:
                a = attn_w2r * caption_mask[:, None, :, None]
                gd_w2r = (a * dist).sum(axis=(2, 3)) / nw
            if g.align_regions:
                a = attn_r2w * region_mask[None, :, None, :]
                gd_r2w = (a * dist).sum(axis=(2, 3)) / nr
        elif g.global_metric == "reconstruction_mse":
            if g.align_words:
                rec = jnp.einsum("ciwr,ird->ciwd", attn_w2r, image_emb)
                mse = ((rec - caption_emb[:, None]) ** 2).mean(axis=3)
                gd_w2r = (mse * caption_mask[:, None, :]).sum(axis=2) / nw
            if g.align_regions:
                rec = jnp.einsum("cwd,ciwr->cird", caption_emb, attn_r2w)
                mse = ((rec - image_emb[None]) ** 2).mean(axis=3)
                gd_r2w = (mse * region_mask[None, :, :]).sum(axis=2) / nr
        else:
            raise NotImplementedError(g.global_metric)

        # empty caption AND empty region pair -> huge distance
        # (reference uses boolean + which is OR, grounding_head.py:241-251)
        pair_ok = (num_words[:, None] > 0) | (num_regions[None, :] > 0)
        if g.align_words:
            gd_w2r = jnp.where(pair_ok, gd_w2r,
                               jax.lax.stop_gradient(gd_w2r.max()) + 100.0)
        if g.align_regions:
            gd_r2w = jnp.where(pair_ok, gd_r2w,
                               jax.lax.stop_gradient(gd_r2w.max()) + 100.0)

        losses: Dict[str, jnp.ndarray] = {}
        other: Dict[str, jnp.ndarray] = {}
        arange = jnp.arange(b)

        def ce_losses(pw_cost, tag):
            lc = jax.nn.log_softmax(-pw_cost, axis=0)
            li = jax.nn.log_softmax(-pw_cost, axis=1)
            losses[f"CE_loss ({tag}, Choose Caption)"] = \
                -jnp.diagonal(lc).mean()
            losses[f"CE_loss ({tag}, Choose Image)"] = \
                -jnp.diagonal(li).mean()

        def triplet_losses(pw_cost, tag, key):
            pos = jnp.diagonal(pw_cost)
            neg_cap_all = _remove_diag(pw_cost, 0)  # [B-1, B]
            neg_img_all = _remove_diag(pw_cost, 1)  # [B, B-1]
            if b < 2:
                neg_cap = pos + g.margin
                neg_img = pos + g.margin
            elif g.negative_mining == "hardest":
                neg_cap = neg_cap_all.min(axis=0)
                neg_img = neg_img_all.min(axis=1)
            elif g.negative_mining == "easiest":
                neg_cap = neg_cap_all.max(axis=0)
                neg_img = neg_img_all.max(axis=1)
            elif g.negative_mining == "random":
                kc, ki = jax.random.split(key)
                ic = jax.random.randint(kc, (b,), 0, b - 1)
                ii = jax.random.randint(ki, (b,), 0, b - 1)
                neg_cap = neg_cap_all[ic, arange]
                neg_img = neg_img_all[arange, ii]
            else:
                raise NotImplementedError(g.negative_mining)
            losses[f"Triplet Loss ({tag}, Choose Caption)"] = \
                jax.nn.relu(pos - neg_cap + g.margin).mean()
            losses[f"Triplet Loss ({tag}, Choose Image)"] = \
                jax.nn.relu(pos - neg_img + g.margin).mean()

        def accuracies(pw_cost, tag):
            other[f"Batch Accuracy ({tag}, Choose Caption)"] = \
                (pw_cost.argmin(axis=0) == arange).mean()
            other[f"Batch Accuracy ({tag}, Choose Image)"] = \
                (pw_cost.argmin(axis=1) == arange).mean()

        if g.loss_type == "matching":
            if g.local_metric == "dot":
                raise ValueError("Matching loss undefined for dot product")
            if g.align_words:
                losses["ImgCap_Match_loss (Align Words)"] = \
                    jnp.diagonal(gd_w2r).mean()
            if g.align_regions:
                losses["ImgCap_Match_loss (Align Regions)"] = \
                    jnp.diagonal(gd_r2w).mean()
        elif g.loss_type == "cross_entropy":
            if g.align_words:
                ce_losses(gd_w2r, "Align Words")
                accuracies(gd_w2r, "Align Words")
            if g.align_regions:
                ce_losses(gd_r2w, "Align Regions")
                accuracies(gd_r2w, "Align Regions")
        elif g.loss_type == "triplet":
            key = rng if rng is not None else jax.random.PRNGKey(0)
            k1, k2 = jax.random.split(key)
            if g.align_words:
                triplet_losses(gd_w2r, "Align Words", k1)
                accuracies(gd_w2r, "Align Words")
            if g.align_regions:
                triplet_losses(gd_r2w, "Align Regions", k2)
                accuracies(gd_r2w, "Align Regions")
        else:
            raise NotImplementedError(g.loss_type)

        if g.return_dist:
            return other, losses, {"w2r": gd_w2r, "r2w": gd_r2w}
        return other, losses

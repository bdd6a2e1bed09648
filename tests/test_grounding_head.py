"""GroundingHead equivalence test: our all-pairs einsum formulation vs a
direct numpy port of the reference's BxB-replication math
(grounding_head.py:92-388, softmax/aligned_local/cross_entropy path)."""
import numpy as np
import jax
import jax.numpy as jnp

from locov_tpu.models.mmss import GroundingHead, GroundingConfig
from locov_tpu.structures.batches import CaptionFeatures, RegionFeatures


def _softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def _reference_grounding(caption_emb, caption_mask, region_feats,
                         region_mask, W, bvl, temp):
    """numpy port of the reference forward (replication formulation)."""
    B, L, D = caption_emb.shape
    _, R, _ = region_feats.shape
    image_emb = region_feats @ W.T + bvl  # [B, R, D]

    # replicate BxB: pair (a=caption, b=image)
    ce = np.repeat(caption_emb[:, None], B, 1).reshape(B * B, L, D)
    ie = np.repeat(image_emb[None], B, 0).reshape(B * B, R, D)
    cm = np.repeat(caption_mask[:, None], B, 1).reshape(B * B, L)
    rm = np.repeat(region_mask[None], B, 0).reshape(B * B, R)
    nw = cm.sum(1)

    sim = np.einsum("kld,krd->klr", ce, ie) / temp
    pair_mask = (cm[:, :, None] * rm[:, None, :]) > 0
    fill = sim.min() - 100.0
    sim = np.where(pair_mask, sim, fill)
    dist = -sim

    att_w2r = _softmax(sim, 2)
    att_r2w = _softmax(sim, 1)

    a = att_w2r * cm[:, :, None]
    gd_w2r = (a * dist).sum((1, 2)) / np.maximum(nw, 1)
    a = att_r2w * rm[:, None, :]
    gd_r2w = (a * dist).sum((1, 2)) / np.maximum(rm.sum(1), 1)

    nr = rm.sum(1)
    ok = (nw > 0) | (nr > 0)
    gd_w2r = np.where(ok, gd_w2r, gd_w2r.max() + 100.0)
    gd_r2w = np.where(ok, gd_r2w, gd_r2w.max() + 100.0)

    pw_w2r = gd_w2r.reshape(B, B)
    pw_r2w = gd_r2w.reshape(B, B)

    def ce_loss(pw):
        lc = np.log(_softmax(-pw, 0))
        li = np.log(_softmax(-pw, 1))
        return -np.diag(lc).mean(), -np.diag(li).mean()

    return pw_w2r, pw_r2w, ce_loss(pw_w2r), ce_loss(pw_r2w)


def test_grounding_matches_reference_math(rng):
    B, L, R, D, V = 4, 7, 9, 16, 24
    caption_emb = rng.randn(B, L, D).astype(np.float32)
    attn = np.ones((B, L), np.int32)
    attn[1, 5:] = 0
    attn[3, 3:] = 0
    special = np.zeros((B, L), np.int32)
    special[:, 0] = 1
    special[0, 6] = 1
    region_feats = rng.randn(B, R, V).astype(np.float32)
    region_mask = np.ones((B, R), bool)
    region_mask[2, 4:] = False
    loc = rng.rand(B, R, 2).astype(np.float32)

    gcfg = GroundingConfig(return_dist=True, text_input="input_embeddings")
    head = GroundingHead(gcfg=gcfg, v_dim=V, l_dim=D)
    cap = CaptionFeatures(
        input_ids=jnp.zeros((B, L), jnp.int32),
        attention_mask=jnp.array(attn),
        special_tokens_mask=jnp.array(special),
        target_ids=jnp.zeros((B, L), jnp.int32),
        mlm_mask=jnp.zeros((B, L), jnp.int32),
        encoded_tokens=jnp.array(caption_emb),
        input_embeddings=jnp.array(caption_emb))
    img = RegionFeatures(features=jnp.array(region_feats),
                         mask=jnp.array(region_mask), loc=jnp.array(loc))

    params = head.init(jax.random.PRNGKey(0), img, cap)
    other, losses, dists = head.apply(params, img, cap)

    W = np.asarray(params["params"]["v2l_projection"]["kernel"]).T
    bvl = np.asarray(params["params"]["v2l_projection"]["bias"])
    cap_mask = attn * (1 - special)
    pw_w2r, pw_r2w, (cw, iw), (cr, ir) = _reference_grounding(
        caption_emb, cap_mask.astype(np.float32), region_feats,
        region_mask.astype(np.float32), W, bvl, gcfg.temperature)

    np.testing.assert_allclose(np.asarray(dists["w2r"]), pw_w2r,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dists["r2w"]), pw_r2w,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        float(losses["CE_loss (Align Words, Choose Caption)"]), cw,
        rtol=1e-4)
    np.testing.assert_allclose(
        float(losses["CE_loss (Align Regions, Choose Image)"]), ir,
        rtol=1e-4)


def test_grounding_empty_caption_does_not_nan(rng):
    B, L, R, D, V = 3, 5, 6, 8, 8
    attn = np.ones((B, L), np.int32)
    special = np.zeros((B, L), np.int32)
    # caption 1 is entirely special tokens -> num_words == 0
    special[1, :] = 1
    cap = CaptionFeatures(
        input_ids=jnp.zeros((B, L), jnp.int32),
        attention_mask=jnp.array(attn),
        special_tokens_mask=jnp.array(special),
        target_ids=jnp.zeros((B, L), jnp.int32),
        mlm_mask=jnp.zeros((B, L), jnp.int32),
        encoded_tokens=jnp.array(rng.randn(B, L, D).astype(np.float32)),
        input_embeddings=jnp.array(rng.randn(B, L, D).astype(np.float32)))
    img = RegionFeatures(features=jnp.array(rng.randn(B, R, V)
                                            .astype(np.float32)),
                         mask=jnp.ones((B, R), bool),
                         loc=jnp.zeros((B, R, 2)))
    head = GroundingHead(gcfg=GroundingConfig(return_dist=True),
                         v_dim=V, l_dim=D)
    params = head.init(jax.random.PRNGKey(0), img, cap)
    _, losses, _ = head.apply(params, img, cap)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_grounding_triplet_and_hardmax_run(rng):
    B, L, R, D, V = 4, 5, 6, 8, 8
    cap = CaptionFeatures(
        input_ids=jnp.zeros((B, L), jnp.int32),
        attention_mask=jnp.ones((B, L), jnp.int32),
        special_tokens_mask=jnp.zeros((B, L), jnp.int32),
        target_ids=jnp.zeros((B, L), jnp.int32),
        mlm_mask=jnp.zeros((B, L), jnp.int32),
        encoded_tokens=jnp.array(rng.randn(B, L, D).astype(np.float32)),
        input_embeddings=jnp.array(rng.randn(B, L, D).astype(np.float32)))
    img = RegionFeatures(features=jnp.array(rng.randn(B, R, V)
                                            .astype(np.float32)),
                         mask=jnp.ones((B, R), bool),
                         loc=jnp.zeros((B, R, 2)))
    for cfg in [GroundingConfig(loss_type="triplet",
                                negative_mining="random"),
                GroundingConfig(loss_type="triplet",
                                negative_mining="hardest"),
                GroundingConfig(alignment="hardmax"),
                GroundingConfig(alignment="random_categorical"),
                GroundingConfig(alignment="random_top3")]:
        head = GroundingHead(gcfg=cfg, v_dim=V, l_dim=D)
        key = jax.random.PRNGKey(3)
        params = head.init(key, img, cap, rng=key)
        out = head.apply(params, img, cap, rng=key)
        losses = out[1]
        assert losses
        for k, v in losses.items():
            assert np.isfinite(float(v)), (cfg.loss_type, cfg.alignment, k)

"""TransformerHead tests: shapes, finiteness, chunking equivalence."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from locov_tpu.models.bert import BertConfig
from locov_tpu.models.mmss import TransformerHead, TransformerHeadConfig
from locov_tpu.structures.batches import CaptionFeatures, RegionFeatures

TINY = BertConfig(vocab_size=50, hidden_size=16, num_hidden_layers=2,
                  num_attention_heads=2, intermediate_size=32,
                  max_position_embeddings=16, hidden_dropout_prob=0.0,
                  attention_probs_dropout_prob=0.0)


def _inputs(rng, B=3, L=6, R=5, V=12, D=16):
    ids = rng.randint(5, 50, size=(B, L)).astype(np.int32)
    attn = np.ones((B, L), np.int32)
    attn[2, 4:] = 0
    special = np.zeros((B, L), np.int32)
    special[:, 0] = 1
    mlm_mask = np.zeros((B, L), np.int32)
    mlm_mask[0, 2] = 1
    mlm_mask[1, 3] = 1
    cap = CaptionFeatures(
        input_ids=jnp.array(ids), attention_mask=jnp.array(attn),
        special_tokens_mask=jnp.array(special),
        target_ids=jnp.array(ids), mlm_mask=jnp.array(mlm_mask),
        encoded_tokens=jnp.array(rng.randn(B, L, D).astype(np.float32)),
        input_embeddings=jnp.array(rng.randn(B, L, D).astype(np.float32)))
    img = RegionFeatures(
        features=jnp.array(rng.randn(B, R, V).astype(np.float32)),
        mask=jnp.array(np.ones((B, R), bool)),
        loc=jnp.array(rng.rand(B, R, 2).astype(np.float32)))
    word_emb = jnp.array(rng.randn(50, 16).astype(np.float32))
    return cap, img, word_emb


def test_transformer_head_losses_finite(rng):
    cap, img, word_emb = _inputs(rng)
    tcfg = TransformerHeadConfig(bert=TINY, mmm_loss="cross_entropy",
                                 return_dist=True)
    head = TransformerHead(tcfg=tcfg, v_dim=12, l_dim=16)
    params = head.init(jax.random.PRNGKey(0), img, cap, word_emb)
    other, losses, dists = head.apply(params, img, cap, word_emb)
    assert dists["trans"].shape == (3, 3)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert "Masked Language Modeling Accuracy" in other
    assert 0.0 <= float(other["Masked Language Modeling Accuracy"]) <= 1.0


def test_transformer_head_chunked_equals_unchunked(rng):
    cap, img, word_emb = _inputs(rng)
    base = TransformerHeadConfig(bert=TINY, mmm_loss="cross_entropy",
                                 return_dist=True)
    h1 = TransformerHead(tcfg=base, v_dim=12, l_dim=16)
    h2 = TransformerHead(tcfg=base._replace(pairwise_chunk=3), v_dim=12,
                         l_dim=16)
    params = h1.init(jax.random.PRNGKey(0), img, cap, word_emb)
    _, l1, d1 = h1.apply(params, img, cap, word_emb)
    _, l2, d2 = h2.apply(params, img, cap, word_emb)
    np.testing.assert_allclose(np.asarray(d1["trans"]),
                               np.asarray(d2["trans"]), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(
        float(l1["Masked Language Modeling Loss"]),
        float(l2["Masked Language Modeling Loss"]), rtol=1e-5)


def test_transformer_head_no_mmm_loss(rng):
    cap, img, word_emb = _inputs(rng)
    tcfg = TransformerHeadConfig(bert=TINY, mmm_loss="")
    head = TransformerHead(tcfg=tcfg, v_dim=12, l_dim=16)
    params = head.init(jax.random.PRNGKey(0), img, cap, word_emb)
    other, losses = head.apply(params, img, cap, word_emb)
    assert float(losses["Image Caption Matching Loss"]) == 0.0


def test_distill_losses_match_torch_kldiv(rng):
    """KD loss vs a torch KLDivLoss(batchmean) reference."""
    import torch
    from locov_tpu.models.mmss import kd_loss

    B, T = 4, 10.0
    t = rng.randn(B, B).astype(np.float32)
    w = rng.randn(B, B).astype(np.float32)
    r = rng.randn(B, B).astype(np.float32)

    got = float(kd_loss(jnp.array(t), jnp.array(w), jnp.array(r), T))

    tt, tw, tr = map(torch.tensor, (t, w, r))
    kld = torch.nn.KLDivLoss(reduction="batchmean")
    p_cap = torch.softmax(-tt / T, dim=0)
    p_img = torch.softmax(-tt / T, dim=1).t()
    want = 0.0
    for s in (tw, tr):
        l_cap = torch.log_softmax(-s / T, dim=0)
        l_img = torch.log_softmax(-s / T, dim=1).t()
        want += (kld(l_cap, p_cap) + kld(l_img, p_img)) * T * T
    # T^2-scaled sums of tiny KL terms amplify f32 softmax noise; 0.2%
    # is well within cross-framework f32 tolerance here
    np.testing.assert_allclose(got, float(want), rtol=2e-3)


@pytest.mark.slow
def test_pairwise_chunk_matches_unchunked_under_grad():
    """TPU.PAIRWISE_CHUNK is a pure memory knob: chunked pairwise
    encoding must equal the unchunked pass in loss AND gradients
    (the round-1 lax.map formulation leaked tracers under jax.grad)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from locov_tpu.models.bert import BertConfig
    from locov_tpu.models.mmss.transformer_head import (
        TransformerHead, TransformerHeadConfig)
    from locov_tpu.structures.batches import (CaptionFeatures,
                                              RegionFeatures)

    B, R, W, D, V = 4, 6, 8, 16, 60
    rng = np.random.RandomState(0)
    bert = BertConfig(vocab_size=V, hidden_size=D, num_hidden_layers=2,
                      num_attention_heads=2, intermediate_size=32,
                      hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)
    caption = CaptionFeatures(
        input_ids=jnp.asarray(rng.randint(5, V, (B, W)), jnp.int32),
        attention_mask=jnp.ones((B, W), jnp.int32),
        special_tokens_mask=jnp.zeros((B, W), jnp.int32),
        target_ids=jnp.asarray(rng.randint(5, V, (B, W)), jnp.int32),
        mlm_mask=jnp.zeros((B, W), jnp.int32),
        encoded_tokens=jnp.asarray(rng.randn(B, W, D), jnp.float32),
        input_embeddings=jnp.asarray(rng.randn(B, W, D), jnp.float32))
    regions = RegionFeatures(
        features=jnp.asarray(rng.randn(B, R, 32), jnp.float32),
        mask=jnp.ones((B, R), jnp.float32),
        loc=jnp.asarray(rng.rand(B, R, 2), jnp.float32))
    word = jnp.asarray(rng.randn(V, D), jnp.float32)

    outs = {}
    for chunk in (0, 4):
        tcfg = TransformerHeadConfig(
            bert=bert, mlm=True, mmm_loss="cross_entropy",
            return_dist=True, pairwise_chunk=chunk)
        head = TransformerHead(tcfg=tcfg, v_dim=32, l_dim=D,
                               external_projection=False)
        params = jax.jit(head.init)(jax.random.PRNGKey(0), regions,
                                    caption, word)

        def loss(f, head=head, params=params):
            _, losses, _ = head.apply(
                params, regions._replace(features=f), caption, word)
            return sum(jax.tree.leaves(losses))

        outs[chunk] = (float(loss(regions.features)),
                       np.asarray(jax.grad(loss)(regions.features)))
    assert outs[4][0] == pytest.approx(outs[0][0], abs=1e-5)
    np.testing.assert_allclose(outs[4][1], outs[0][1], rtol=1e-4,
                               atol=1e-6)

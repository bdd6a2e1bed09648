"""From-scratch BERT in Flax (encoder, embeddings, pooler, LM head).

Replaces the HuggingFace ``BertModel`` / ``BertEncoder`` / ``BertPooler``
/ ``BertLMPredictionHead`` the reference pulls in
(``transf_models.py:5``, ``transformer_head.py:6-12``). Post-LN
architecture with learned positions, gelu, and a prediction head whose
decoder is tied to the word-embedding matrix (the tie is explicit: the
matrix is a forward input, mirroring ``TransformerHead._tie_weights``,
transformer_head.py:69-78). Weight import from HF checkpoints is handled
by ``locov_tpu/utils/checkpoint.py`` name mapping.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class BertConfig(NamedTuple):
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    # flax COMPUTATION dtype for the dense/attention math (params stay
    # f32; LayerNorm/softmax accumulate f32). None = f32 exactly.
    dtype: Any = None

    @classmethod
    def from_cfg_node(cls, node):
        """Build from the MMSS_HEAD.TRANSFORMER.BERT_CONFIG CfgNode."""
        known = cls._fields
        return cls(**{k: v for k, v in node.items() if k in known})


def _dense(cfg, features, name):
    return nn.Dense(features, name=name, dtype=cfg.dtype,
                    kernel_init=nn.initializers.normal(cfg.initializer_range))


class _DenseParams(nn.Module):
    """Parameter holder with ``nn.Dense``'s exact param paths
    (``<name>/kernel``, ``<name>/bias``) so checkpoints import
    unchanged while the matmul itself is fused elsewhere."""
    shape: tuple
    init_std: float

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.normal(self.init_std),
                       tuple(self.shape))
        b = self.param("bias", nn.initializers.zeros, (self.shape[-1],))
        return k, b


class BertSelfAttention(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, hidden, attention_bias, deterministic=True):
        c = self.cfg
        h = c.hidden_size
        nh = c.num_attention_heads
        hd = h // nh
        # fused QKV: one [*, h] @ [h, 3h] matmul instead of three
        # [h, h] ones — at the short sequences this head runs on
        # (<=170 tokens x B*B pairs) every op pays a fixed pipeline
        # cost, so fewer/bigger matmuls measurably beat three small
        # ones (PERF.md). Params keep nn.Dense's query/key/value paths.
        wq, bq = _DenseParams((h, h), c.initializer_range, name="query")()
        wk, bk = _DenseParams((h, h), c.initializer_range, name="key")()
        wv, bv = _DenseParams((h, h), c.initializer_range, name="value")()
        w = jnp.concatenate([wq, wk, wv], axis=1)       # [h, 3h]
        b = jnp.concatenate([bq, bk, bv])               # [3h]
        # match nn.Dense promotion semantics when cfg.dtype is None
        # ("None = f32 exactly"): bf16 activations x f32 params must
        # promote to f32, not silently stay bf16
        dt = c.dtype or jnp.promote_types(hidden.dtype, jnp.float32)
        qkv = hidden.astype(dt) @ w.astype(dt) + b.astype(dt)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(x):
            return x.reshape(x.shape[:-1] + (nh, hd)).swapaxes(-2, -3)

        q, k, v = split(q), split(k), split(v)  # [B, nh, L, hd]
        scores = jnp.einsum("...qd,...kd->...qk", q, k) / jnp.sqrt(hd)
        scores = scores + attention_bias  # [B, 1, 1, L] broadcast
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(c.attention_probs_dropout_prob)(
            probs, deterministic=deterministic)
        ctx = jnp.einsum("...qk,...kd->...qd", probs, v)
        ctx = ctx.swapaxes(-2, -3).reshape(hidden.shape)
        return ctx


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, hidden, attention_bias, deterministic=True):
        c = self.cfg
        attn = BertSelfAttention(c, name="attention_self")(
            hidden, attention_bias, deterministic)
        attn = _dense(c, c.hidden_size, "attention_output")(attn)
        attn = nn.Dropout(c.hidden_dropout_prob)(attn,
                                                 deterministic=deterministic)
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps,
                              name="attention_norm")(hidden + attn)
        inter = _dense(c, c.intermediate_size, "intermediate")(hidden)
        inter = nn.gelu(inter, approximate=False)
        out = _dense(c, c.hidden_size, "output")(inter)
        out = nn.Dropout(c.hidden_dropout_prob)(out,
                                                deterministic=deterministic)
        return nn.LayerNorm(epsilon=c.layer_norm_eps,
                            name="output_norm")(hidden + out)


class BertEncoder(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, hidden, attention_mask, deterministic=True,
                 raw_additive_mask=False):
        """hidden: [B, L, H]; attention_mask: [B, L] (1 = attend).

        raw_additive_mask=True reproduces the reference TransformerHead
        verbatim: it hands the 0/1 float mask straight to HF's
        ``BertEncoder`` as the ADDITIVE attention bias
        (``transformer_head.py:170-176`` — valid positions get +1 on
        the pre-softmax logits, padded positions +0), so attention
        leaks to padding instead of being masked out. The language
        backbone goes through HF ``BertModel``, which builds the proper
        ``(1-m)*min`` extended mask — keep the default False there.
        """
        m = attention_mask[:, None, None, :].astype(hidden.dtype)
        if raw_additive_mask:
            bias = m
        else:
            bias = (1.0 - m) * jnp.finfo(hidden.dtype).min
        for i in range(self.cfg.num_hidden_layers):
            hidden = BertLayer(self.cfg, name=f"layer_{i}")(
                hidden, bias, deterministic)
        return hidden


class BertEmbeddings(nn.Module):
    """word + position + token-type embeddings, LN, dropout. setup-style
    so the word matrix is reachable without a forward call (needed for
    the tied LM decoder and the embeddings-only language backbone)."""
    cfg: BertConfig

    def setup(self):
        c = self.cfg
        init = nn.initializers.normal(c.initializer_range)
        self.word_embeddings = self.param(
            "word_embeddings", init, (c.vocab_size, c.hidden_size))
        self.position_embeddings = self.param(
            "position_embeddings", init,
            (c.max_position_embeddings, c.hidden_size))
        self.token_type_embeddings = self.param(
            "token_type_embeddings", init,
            (c.type_vocab_size, c.hidden_size))
        self.norm = nn.LayerNorm(epsilon=c.layer_norm_eps, name="norm")
        self.dropout = nn.Dropout(c.hidden_dropout_prob)

    def __call__(self, input_ids, token_type_ids=None, deterministic=True,
                 add_position: bool = True):
        x = self.word_embeddings[input_ids]
        if add_position:
            if token_type_ids is None:
                token_type_ids = jnp.zeros_like(input_ids)
            x = (x + self.position_embeddings[
                jnp.arange(input_ids.shape[-1])]
                 + self.token_type_embeddings[token_type_ids])
            x = self.norm(x)
            x = self.dropout(x, deterministic=deterministic)
        return x


class BertPooler(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, hidden):
        first = hidden[..., 0, :]
        return jnp.tanh(_dense(self.cfg, self.cfg.hidden_size,
                               "dense")(first))


class BertPredictionTransform(nn.Module):
    """dense + gelu + LN (HF BertPredictionHeadTransform)."""
    cfg: BertConfig

    @nn.compact
    def __call__(self, hidden):
        h = _dense(self.cfg, self.cfg.hidden_size, "dense")(hidden)
        h = nn.gelu(h, approximate=False)
        return nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, name="norm")(h)


class BertLMHead(nn.Module):
    """transform + tied decoder: logits = transform(h) @ word_emb.T + b."""
    cfg: BertConfig

    @nn.compact
    def __call__(self, hidden, word_embeddings):
        h = BertPredictionTransform(self.cfg, name="transform")(hidden)
        bias = self.param("decoder_bias", nn.initializers.zeros,
                          (self.cfg.vocab_size,))
        return h @ word_embeddings.T + bias


class BertModel(nn.Module):
    """Embeddings + encoder (+ optional pooler), HF-compatible layout."""
    cfg: BertConfig

    def setup(self):
        self.embeddings = BertEmbeddings(self.cfg)
        self.encoder = BertEncoder(self.cfg)

    def __call__(self, input_ids, attention_mask, token_type_ids=None,
                 deterministic=True):
        x = self.embeddings(input_ids, token_type_ids,
                            deterministic=deterministic)
        return self.encoder(x, attention_mask, deterministic=deterministic)

    def embed_only(self, input_ids, token_type_ids=None,
                   deterministic=True, add_position=True):
        return self.embeddings(input_ids, token_type_ids,
                               deterministic=deterministic,
                               add_position=add_position)

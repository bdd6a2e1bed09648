"""Language backbones: full BERT and embeddings-only BertEmbedding.

Device-side counterpart of the reference's ``BERT`` / ``BertEmbedding``
(``ovr/modeling/language/transf_models.py``). Tokenization and MLM
masking are host-side (``locov_tpu/data/tokenization.py``, emitting a
static ``TextBatch``); this module embeds/encodes on device and
produces the ``CaptionFeatures`` dict-equivalent the MMSS heads consume:
``encoded_tokens`` (full-BERT output, or raw/position-added embeddings
for the embedding-only variant, transf_models.py:142-152) and
``input_embeddings`` (always the raw word embeddings).

Freezing (LANGUAGE_BACKBONE.FREEZE) is enforced by the optimizer mask.
"""
from __future__ import annotations

from flax import linen as nn

from ..structures.batches import CaptionFeatures, TextBatch
from .bert import BertConfig, BertModel

LANGUAGE_BACKBONES = {}


def register_language_backbone(name):
    def deco(cls):
        LANGUAGE_BACKBONES[name] = cls
        return cls
    return deco


@register_language_backbone("build_bert_backbone")
class BertBackbone(nn.Module):
    """Full 12-layer BERT: encoded_tokens = encoder output
    (transf_models.py:61-67)."""
    bert_cfg: BertConfig
    out_channels: int = 768

    def setup(self):
        self.bert_model = BertModel(self.bert_cfg)

    def __call__(self, text: TextBatch,
                 deterministic: bool = True) -> CaptionFeatures:
        encoded = self.bert_model(text.input_ids, text.attention_mask,
                                  deterministic=deterministic)
        word_emb = self.word_embedding_matrix()
        return CaptionFeatures(
            input_ids=text.input_ids,
            attention_mask=text.attention_mask,
            special_tokens_mask=text.special_tokens_mask,
            target_ids=text.target_ids,
            mlm_mask=text.mlm_mask,
            encoded_tokens=encoded,
            input_embeddings=word_emb[text.input_ids])

    def word_embedding_matrix(self):
        return self.bert_model.embeddings.word_embeddings


@register_language_backbone("build_bertemb_backbone")
class BertEmbeddingBackbone(nn.Module):
    """Embeddings-only variant (LSM default,
    configs/coco_lsm.yaml:46): encoded_tokens = word embeddings, with
    optional position embeddings (ADD_POSITION_EMBEDDING)."""
    bert_cfg: BertConfig
    add_position_embedding: bool = False
    out_channels: int = 768

    def setup(self):
        self.bert_model = BertModel(self.bert_cfg)

    def __call__(self, text: TextBatch,
                 deterministic: bool = True) -> CaptionFeatures:
        word_emb = self.word_embedding_matrix()
        input_embeddings = word_emb[text.input_ids]
        if self.add_position_embedding:
            encoded = self.bert_model.embed_only(
                text.input_ids, deterministic=deterministic,
                add_position=True)
        else:
            encoded = input_embeddings
        return CaptionFeatures(
            input_ids=text.input_ids,
            attention_mask=text.attention_mask,
            special_tokens_mask=text.special_tokens_mask,
            target_ids=text.target_ids,
            mlm_mask=text.mlm_mask,
            encoded_tokens=encoded,
            input_embeddings=input_embeddings)

    def word_embedding_matrix(self):
        return self.bert_model.embeddings.word_embeddings


def build_language_backbone(cfg):
    name = cfg.MODEL.LANGUAGE_BACKBONE.TYPE
    if name not in LANGUAGE_BACKBONES:
        raise KeyError(f"Unknown LANGUAGE_BACKBONE.TYPE: {name}")
    bert_cfg = BertConfig.from_cfg_node(
        cfg.MODEL.MMSS_HEAD.TRANSFORMER.BERT_CONFIG)._replace(
            # the language model is always the full-size pretrained BERT
            # (the 6-layer override in coco_lsm.yaml applies only to the
            # multimodal TransformerHead)
            num_hidden_layers=12, num_attention_heads=12,
            intermediate_size=3072)
    kwargs = {}
    if name == "build_bertemb_backbone":
        kwargs["add_position_embedding"] = \
            cfg.MODEL.LANGUAGE_BACKBONE.ADD_POSITION_EMBEDDING
    return LANGUAGE_BACKBONES[name](bert_cfg=bert_cfg, **kwargs)

"""Weight-import naming alignment: a synthetic torch-style LSM
state_dict (d2 + HF naming) must convert onto the REAL flax param tree
of our LSM model with near-total coverage."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from locov_tpu.config import get_cfg
from locov_tpu.models import build_meta_arch
from locov_tpu.structures.batches import (DetectionBatch, GtBatch,
                                          ImageBatch, TextBatch)
from locov_tpu.utils.checkpoint import (convert_bert_state_dict,
                                        convert_d2_state_dict,
                                        flatten_params)


_BN_LEAVES = ["weight", "bias", "running_mean", "running_var"]


def _add_bottleneck_stage(add, prefix, n_blocks, c_in, c_mid, c_out):
    """Emit every torch param name of a d2 ResNet bottleneck stage:
    conv1/2/3 (+ FrozenBN stats) per block, shortcut (+ norm) on block
    0 — the complete surface a real R-50-C4 checkpoint contains."""
    for b in range(n_blocks):
        cin = c_in if b == 0 else c_out
        add(f"{prefix}.{b}.conv1.weight", c_mid, cin, 1, 1)
        add(f"{prefix}.{b}.conv2.weight", c_mid, c_mid, 3, 3)
        add(f"{prefix}.{b}.conv3.weight", c_out, c_mid, 1, 1)
        for conv, ch in [("conv1", c_mid), ("conv2", c_mid),
                         ("conv3", c_out)]:
            for leaf in _BN_LEAVES:
                add(f"{prefix}.{b}.{conv}.norm.{leaf}", ch)
        if b == 0:
            add(f"{prefix}.0.shortcut.weight", c_out, cin, 1, 1)
            for leaf in _BN_LEAVES:
                add(f"{prefix}.0.shortcut.norm.{leaf}", c_out)


def _fake_torch_lsm_state(nlayers_lang=2, nlayers_head=2, hidden=16,
                          vocab=50, inter=32, v_dim=2048):
    """Random tensors under the reference's torch names — a COMPLETE
    R-50-C4 LSM surface (every backbone/res5 block incl. shortcut
    norms), so 'every converted key must land' really covers the
    import path for a real lsm_coco.pth."""
    rng = np.random.RandomState(0)
    s = {}

    def add(name, *shape):
        s[name] = rng.randn(*shape).astype(np.float32)

    # backbone: full R-50 stem + res2(3)/res3(4)/res4(6)
    add("backbone.stem.conv1.weight", 64, 3, 7, 7)
    for leaf in _BN_LEAVES:
        add(f"backbone.stem.conv1.norm.{leaf}", 64)
    _add_bottleneck_stage(add, "backbone.res2", 3, 64, 64, 256)
    _add_bottleneck_stage(add, "backbone.res3", 4, 256, 128, 512)
    _add_bottleneck_stage(add, "backbone.res4", 6, 512, 256, 1024)
    # rpn
    add("proposal_generator.rpn_head.conv.weight", 1024, 1024, 3, 3)
    add("proposal_generator.rpn_head.conv.bias", 1024)
    add("proposal_generator.rpn_head.objectness_logits.weight",
        15, 1024, 1, 1)
    add("proposal_generator.rpn_head.objectness_logits.bias", 15)
    add("proposal_generator.rpn_head.anchor_deltas.weight",
        60, 1024, 1, 1)
    add("proposal_generator.rpn_head.anchor_deltas.bias", 60)
    # roi res5 (full 3-block stage incl. shortcut norm) + predictor
    _add_bottleneck_stage(add, "roi_heads.res5", 3, 1024, 512, 2048)
    add("roi_heads.box_predictor.bbox_pred.weight", 4, v_dim)
    add("roi_heads.box_predictor.bbox_pred.bias", 4)
    add("roi_heads.box_predictor.emb_pred.weight", hidden, v_dim)
    add("roi_heads.box_predictor.emb_pred.bias", hidden)
    # language backbone (embeddings-only BertEmbedding path)
    lb = "language_backbone.body.bert_model."
    add(lb + "embeddings.word_embeddings.weight", vocab, hidden)
    add(lb + "embeddings.position_embeddings.weight", 16, hidden)
    add(lb + "embeddings.token_type_embeddings.weight", 2, hidden)
    add(lb + "embeddings.LayerNorm.weight", hidden)
    add(lb + "embeddings.LayerNorm.bias", hidden)
    # mmss heads
    add("mmss_heads.GroundingHead.v2l_projection.weight", hidden, v_dim)
    add("mmss_heads.GroundingHead.v2l_projection.bias", hidden)
    th = "mmss_heads.TransformerHead."
    add(th + "visual_emb.image_embeddings.weight", hidden, hidden)
    add(th + "visual_emb.image_embeddings.bias", hidden)
    add(th + "visual_emb.image_location_embeddings.weight", hidden, 2)
    add(th + "visual_emb.image_location_embeddings.bias", hidden)
    add(th + "visual_emb.LayerNorm.weight", hidden)
    add(th + "visual_emb.LayerNorm.bias", hidden)
    add(th + "pooler.dense.weight", hidden, hidden)
    add(th + "pooler.dense.bias", hidden)
    add(th + "heads.bi_seq_relationship.weight", 2, hidden)
    add(th + "heads.bi_seq_relationship.bias", 2)
    add(th + "heads.predictions.transform.dense.weight", hidden, hidden)
    add(th + "heads.predictions.transform.dense.bias", hidden)
    add(th + "heads.predictions.transform.LayerNorm.weight", hidden)
    add(th + "heads.predictions.transform.LayerNorm.bias", hidden)
    add(th + "heads.predictions.bias", vocab)
    for i in range(nlayers_head):
        p = th + f"encoder.layer.{i}."
        for qkv in ["query", "key", "value"]:
            add(p + f"attention.self.{qkv}.weight", hidden, hidden)
            add(p + f"attention.self.{qkv}.bias", hidden)
        add(p + "attention.output.dense.weight", hidden, hidden)
        add(p + "attention.output.dense.bias", hidden)
        add(p + "attention.output.LayerNorm.weight", hidden)
        add(p + "attention.output.LayerNorm.bias", hidden)
        add(p + "intermediate.dense.weight", inter, hidden)
        add(p + "intermediate.dense.bias", inter)
        add(p + "output.dense.weight", hidden, inter)
        add(p + "output.dense.bias", hidden)
        add(p + "output.LayerNorm.weight", hidden)
        add(p + "output.LayerNorm.bias", hidden)
    return s


def _tiny_lsm_model():
    cfg = get_cfg()
    from locov_tpu.config import config_path
    cfg.merge_from_file(config_path("coco_lsm.yaml"))
    for node in (cfg.MODEL.LANGUAGE_BACKBONE.BERT_CONFIG,
                 cfg.MODEL.MMSS_HEAD.TRANSFORMER.BERT_CONFIG):
        node.vocab_size = 50
        node.hidden_size = 16
        node.num_hidden_layers = 2
        node.num_attention_heads = 2
        node.intermediate_size = 32
        node.max_position_embeddings = 16
        node.hidden_dropout_prob = 0.0
    cfg.MODEL.ROI_BOX_HEAD.EMB_DIM = 16
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 8
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 16
    cfg.MODEL.MMSS_HEAD.SPATIAL_DROPOUT = 4
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_meta_arch(cfg)
    rng = np.random.RandomState(0)
    b, hw, L = 1, 64, 6
    batch = DetectionBatch(
        images=ImageBatch(
            image=jnp.asarray(rng.rand(b, hw, hw, 3).astype(np.float32)),
            hw=jnp.full((b, 2), hw, jnp.int32),
            orig_hw=jnp.full((b, 2), hw, jnp.int32)),
        gt=GtBatch(boxes=jnp.asarray([[[4.0, 4, 30, 30]]]),
                   classes=jnp.ones((b, 1), jnp.int32),
                   mask=jnp.ones((b, 1), bool)),
        text=TextBatch(
            input_ids=jnp.asarray(rng.randint(5, 50, (b, L)), jnp.int32),
            attention_mask=jnp.ones((b, L), jnp.int32),
            special_tokens_mask=jnp.zeros((b, L), jnp.int32),
            target_ids=jnp.asarray(rng.randint(5, 50, (b, L)), jnp.int32),
            mlm_mask=jnp.zeros((b, L), jnp.int32)))
    class_emb = jnp.asarray(rng.randn(81, 16).astype(np.float32))
    key = jax.random.PRNGKey(0)
    params = model.init(key, batch, class_emb, key, method=model.losses)
    return params


@pytest.mark.slow
def test_lsm_torch_names_align_with_flax_tree():
    state = _fake_torch_lsm_state()
    converted = convert_d2_state_dict(state)
    params = _tiny_lsm_model()
    flat = flatten_params(params["params"])

    # the embeddings-only language backbone (ADD_POSITION_EMBEDDING
    # False) never instantiates its LayerNorm, so those two reference
    # params have no destination in this configuration
    optional = {
        "language_backbone/bert_model/embeddings/norm/scale",
        "language_backbone/bert_model/embeddings/norm/bias",
        # with TIE_VL_PROJECTION_WEIGHTS the detector's emb_pred IS the
        # shared mmss_heads/v2l_projection param (one tensor in our
        # tree); the torch checkpoint stores the tied tensor under both
        # names, and the v2l name is the one that lands
        "roi_heads/box_predictor/emb_pred/kernel",
        "roi_heads/box_predictor/emb_pred/bias",
    }
    hits, misses = [], []
    for k, v in converted.items():
        if k in flat:
            assert flat[k].shape == v.shape, \
                f"{k}: {v.shape} vs {flat[k].shape}"
            hits.append(k)
        elif k not in optional:
            misses.append(k)
    # every converted name must exist in the live tree with the right
    # shape (this is what makes real lsm_coco.pth ingestion work)
    assert not misses, f"unmatched converted keys: {misses}"
    assert len(hits) > 50
    # regression: the res5 shortcut FrozenBN import (a '{2}' template
    # typo once made this key literally 'roi_heads/res5/0/shortcut_norm/{2}')
    for leaf in ["weight", "bias", "running_mean", "running_var"]:
        assert f"roi_heads/res5/0/shortcut_norm/{leaf}" in hits
    # full-surface coverage: every trunk param of the live tree must be
    # populated by the synthetic checkpoint (catches silent import gaps)
    uncovered = [k for k in flat
                 if k.split("/")[0] in ("backbone", "rpn_head",
                                        "roi_heads")
                 and k not in hits]
    assert not uncovered, f"live params never imported: {uncovered}"


def test_import_report_non_regressing():
    """The day-1 parity runbook (README) trusts the ImportReport before
    any AP number: on the complete synthetic LSM surface the report
    must show full coverage — zero missing dst params, zero shape
    mismatches, and only the four documented tied/optional source keys
    unused. Any regression here would silently corrupt a real
    lsm_coco.pth / LocOV.pth ingestion."""
    from locov_tpu.utils.checkpoint import load_with_rename_map

    state = _fake_torch_lsm_state()
    converted = convert_d2_state_dict(state)
    params = _tiny_lsm_model()
    flat_dst = flatten_params(params["params"])
    merged, report = load_with_rename_map(converted, flat_dst, {})
    assert report.missing == []
    assert report.mismatched == []
    assert set(report.unused_src) == {
        # embeddings-only language backbone: LayerNorm never built
        "language_backbone/bert_model/embeddings/norm/bias",
        "language_backbone/bert_model/embeddings/norm/scale",
        # TIE_VL_PROJECTION_WEIGHTS: emb_pred IS v2l_projection in our
        # tree; the checkpoint's duplicate tensor lands under v2l
        "roi_heads/box_predictor/emb_pred/bias",
        "roi_heads/box_predictor/emb_pred/kernel",
    }
    assert len(report.loaded) == len(flat_dst)
    # legacy list behavior: the report doubles as the missing list
    assert list(report) == []


def test_bare_hf_bert_conversion():
    rng = np.random.RandomState(0)
    state = {
        "bert.embeddings.word_embeddings.weight": rng.randn(50, 16),
        "bert.encoder.layer.0.attention.self.query.weight":
            rng.randn(16, 16),
        "bert.encoder.layer.0.output.LayerNorm.weight": rng.randn(16),
        "bert.pooler.dense.weight": rng.randn(16, 16),
    }
    out = convert_bert_state_dict(state, dest_prefix="pfx/")
    assert "pfx/embeddings/word_embeddings" in out
    assert out["pfx/encoder/layer_0/attention_self/query/kernel"].shape \
        == (16, 16)
    assert "pfx/encoder/layer_0/output_norm/scale" in out
    assert "pfx/pooler/dense/kernel" in out

"""End-to-end smoke test for the LSM flagship meta-arch
(DistillProposalMMSSRCNN) on tiny shapes."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from locov_tpu.config import get_cfg
from locov_tpu.models import build_meta_arch
from locov_tpu.structures.batches import (DetectionBatch, GtBatch,
                                          ImageBatch, TextBatch)

pytestmark = pytest.mark.slow

TINY_LANG = (50, 16, 2, 2, 32, 0.0, 0.0, 16, 2, 0.02, 1e-12, 0)


def _lsm_cfg():
    cfg = get_cfg()
    from locov_tpu.config import config_path
    cfg.merge_from_file(config_path("coco_lsm.yaml"))
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 12
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 48
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 24
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 48
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 16
    cfg.MODEL.MMSS_HEAD.SPATIAL_DROPOUT = 6
    cfg.MODEL.MMSS_HEAD.TRANSFORMER.BERT_CONFIG.vocab_size = 50
    cfg.MODEL.MMSS_HEAD.TRANSFORMER.BERT_CONFIG.hidden_size = 16
    cfg.MODEL.MMSS_HEAD.TRANSFORMER.BERT_CONFIG.num_hidden_layers = 2
    cfg.MODEL.MMSS_HEAD.TRANSFORMER.BERT_CONFIG.num_attention_heads = 2
    cfg.MODEL.MMSS_HEAD.TRANSFORMER.BERT_CONFIG.intermediate_size = 32
    cfg.MODEL.MMSS_HEAD.TRANSFORMER.BERT_CONFIG.hidden_dropout_prob = 0.0
    cfg.MODEL.ROI_BOX_HEAD.EMB_DIM = 16
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


@pytest.fixture(scope="module")
def lsm_setup():
    cfg = _lsm_cfg()
    model = build_meta_arch(cfg, lang_bert_cfg=TINY_LANG)

    b, h, w, L = 2, 64, 64, 8
    rng = np.random.RandomState(0)
    images = ImageBatch(
        image=jnp.array(rng.rand(b, h, w, 3).astype(np.float32) * 255),
        hw=jnp.array([[64, 64], [48, 56]]),
        orig_hw=jnp.array([[64, 64], [48, 56]]))
    # binary OLN-proposal gt (change_proposals_as_gt: classes all 1)
    gt = GtBatch(
        boxes=jnp.array([[[4.0, 4.0, 30.0, 30.0], [10.0, 20.0, 40.0, 44.0],
                          [0.0, 0.0, 0.0, 0.0]],
                         [[8.0, 8.0, 24.0, 24.0], [0.0, 0.0, 0.0, 0.0],
                          [0.0, 0.0, 0.0, 0.0]]]),
        classes=jnp.ones((2, 3), jnp.int32),
        mask=jnp.array([[True, True, False], [True, False, False]]))
    ids = rng.randint(5, 50, size=(b, L)).astype(np.int32)
    attn = np.ones((b, L), np.int32)
    attn[1, 6:] = 0
    special = np.zeros((b, L), np.int32)
    special[:, 0] = 1
    special[0, 7] = 1
    special[1, 5] = 1
    mlm = np.zeros((b, L), np.int32)
    mlm[0, 3] = 1
    text = TextBatch(input_ids=jnp.array(ids),
                     attention_mask=jnp.array(attn),
                     special_tokens_mask=jnp.array(special),
                     target_ids=jnp.array(ids), mlm_mask=jnp.array(mlm))
    batch = DetectionBatch(images=images, gt=gt, text=text)
    class_emb = jnp.array(rng.randn(81, 16).astype(np.float32))
    class_emb = class_emb.at[-1].set(0.0)
    return cfg, model, batch, class_emb


def test_lsm_losses_complete_and_finite(lsm_setup):
    cfg, model, batch, class_emb = lsm_setup
    key = jax.random.PRNGKey(0)
    params = model.init(key, batch, class_emb, key, method=model.losses)
    outputs, losses = model.apply(params, batch, class_emb, key,
                                  method=model.losses)
    # the reference's LSM loss inventory (grid + box passes + detector +
    # rpn + 3 distill losses)
    must_have = {
        "loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg",
        "CE_loss (Align Words, Choose Caption)",
        "CE_loss (Align Regions, Choose Image)",
        "Masked Language Modeling Loss", "Image Caption Matching Loss",
        "Box CE_loss (Align Words, Choose Caption)",
        "Box Masked Language Modeling Loss",
        "kd_loss", "box_kd_loss", "mixbox_kd_loss",
    }
    missing = must_have - set(losses)
    assert not missing, f"missing losses: {missing}"
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert "Batch Accuracy (Align Words, Choose Caption)" in outputs
    assert "Box Batch Accuracy (Choose Image)" in outputs


def test_lsm_grads_flow_including_v2l(lsm_setup):
    cfg, model, batch, class_emb = lsm_setup
    key = jax.random.PRNGKey(1)
    params = model.init(key, batch, class_emb, key, method=model.losses)

    def loss_fn(p):
        _, l = model.apply(p, batch, class_emb, key, method=model.losses)
        return sum(jax.tree.leaves(l))

    g = jax.grad(loss_fn)(params)
    # the tied v2l projection must receive gradient from the mmss losses
    v2l = g["params"]["mmss_heads"]["v2l_projection"]["kernel"]
    assert float(jnp.abs(v2l).sum()) > 0
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0


def test_lsm_inference_runs(lsm_setup):
    cfg, model, batch, class_emb = lsm_setup
    key = jax.random.PRNGKey(2)
    params = model.init(key, batch, class_emb, key, method=model.losses)
    dets = model.apply(params, batch, class_emb, method=model.inference)
    assert dets.boxes.shape == (2, 8, 4)


def test_fused_mmss_pass_matches_unfused(lsm_setup):
    """TPU.FUSED_MMSS_PASSES merges the grid and box MMSS passes into
    one transformer-head invocation; per-group losses must match the
    reference two-pass structure exactly (same params, deterministic)."""
    cfg, unfused, batch, class_emb = lsm_setup
    from locov_tpu.models import build_meta_arch
    assert not unfused.fused_mmss  # default keeps the two-pass structure
    model = build_meta_arch(cfg, lang_bert_cfg=TINY_LANG,
                            fused_mmss=True)
    key = jax.random.PRNGKey(4)
    params = model.init(key, batch, class_emb, key, method=model.losses)
    of, lf = model.apply(params, batch, class_emb, key,
                         method=model.losses)
    ou, lu = unfused.apply(params, batch, class_emb, key,
                           method=unfused.losses)
    assert set(lf) == set(lu) and set(of) == set(ou)
    for k in lu:
        np.testing.assert_allclose(np.asarray(lf[k]), np.asarray(lu[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)
    for k in ou:
        np.testing.assert_allclose(np.asarray(of[k]), np.asarray(ou[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


def test_lsm_param_structure_has_tied_projection(lsm_setup):
    cfg, model, batch, class_emb = lsm_setup
    key = jax.random.PRNGKey(3)
    params = model.init(key, batch, class_emb, key, method=model.losses)
    p = params["params"]
    assert "v2l_projection" in p["mmss_heads"]
    # tied: heads must NOT own their own projection (the grounding head
    # then has no params at all and is absent from the tree), and the
    # detector's box predictor must have no emb_pred of its own
    assert "v2l_projection" not in p["mmss_heads"].get(
        "grounding_head", {})
    assert "emb_pred" not in p["roi_heads"]["box_predictor"]

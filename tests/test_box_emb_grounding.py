"""Multi-token grounding box predictor: unit equivalences + STT
end-to-end with MODEL.ROI_BOX_HEAD.NAME selecting it (reference
build_box_predictor, box_emb_head.py:239-249; the reference's own
grounding path is latent-broken — box_emb_grounding_head.py:355 reads
an undefined cfg key — so this surpasses, not mirrors, it)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from locov_tpu.config import get_cfg
from locov_tpu.models import build_meta_arch
from locov_tpu.models.box_emb_grounding import (
    ClassTokenEmbeddings, EmbeddingGroundingBoxPredictor,
    grounding_class_scores)
from locov_tpu.models.box_predictor import (BoxPredictorConfig,
                                            EmbeddingBoxPredictor)
from locov_tpu.structures.batches import (DetectionBatch, GtBatch,
                                          ImageBatch)


def test_single_token_matches_plain_dot_predictor():
    """With one token per class and temperature 1, grounding scores
    must equal the plain embedding predictor's dot-product scores."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 7, 32).astype(np.float32))
    cemb = rng.randn(6, 8).astype(np.float32)
    cemb[-1] = 0.0

    pcfg = BoxPredictorConfig(
        num_classes=5, emb_dim=8, embedding_based=True,
        normalize_emb=False, standardize_emb=False,
        detach_cls_predictor=False, cls_agnostic_bbox_reg=True,
        bbox_reg_weights=(10., 10., 5., 5.), smooth_l1_beta=0.0,
        box_reg_loss_type="smooth_l1", box_reg_loss_weight=1.0,
        test_score_thresh=0.0, test_nms_thresh=0.5,
        test_topk_per_image=10)
    plain = EmbeddingBoxPredictor(pcfg)
    p_params = plain.init(jax.random.PRNGKey(0), x, jnp.asarray(cemb))

    grounding = EmbeddingGroundingBoxPredictor(
        emb_dim=8, local_metric="dot", alignment="softmax",
        temperature=1.0)
    tokens = ClassTokenEmbeddings(
        tokens=jnp.asarray(cemb)[:, None, :],
        mask=jnp.ones((6, 1), jnp.float32))
    with jax.default_matmul_precision("highest"):
        s0, d0 = plain.apply(p_params, x, jnp.asarray(cemb))
        s1, d1 = grounding.apply(p_params, x, tokens)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0))


def test_multi_token_hardmax_takes_best_token():
    """hardmax alignment: class score is the best token similarity."""
    rng = np.random.RandomState(1)
    emb = jnp.asarray(rng.randn(4, 8).astype(np.float32))
    toks = rng.randn(3, 2, 8).astype(np.float32)
    mask = np.ones((3, 2), np.float32)
    mask[2, 1] = 0.0  # class 2 has a single real token
    ct = ClassTokenEmbeddings(jnp.asarray(toks), jnp.asarray(mask))
    with jax.default_matmul_precision("highest"):
        scores = grounding_class_scores(emb, ct, "dot", "hardmax", 1.0)
    sim = np.einsum("nd,ktd->nkt", np.asarray(emb), toks)
    sim[:, 2, 1] = -np.inf  # masked token can't win
    np.testing.assert_allclose(np.asarray(scores), sim.max(axis=2),
                               atol=1e-5)


def test_softmax_alignment_excludes_padded_tokens():
    rng = np.random.RandomState(2)
    emb = jnp.asarray(rng.randn(2, 4).astype(np.float32))
    # class 0: token 1 is padding with HUGE values; must not leak
    toks = np.zeros((1, 2, 4), np.float32)
    toks[0, 0] = rng.randn(4)
    toks[0, 1] = 1e6
    mask = np.array([[1.0, 0.0]], np.float32)
    ct = ClassTokenEmbeddings(jnp.asarray(toks), jnp.asarray(mask))
    scores = grounding_class_scores(emb, ct, "dot", "softmax", 1.0)
    want = np.asarray(emb) @ toks[0, 0]
    np.testing.assert_allclose(np.asarray(scores)[:, 0], want, atol=1e-4)


@pytest.fixture(scope="module")
def grounding_stt():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "OvrRCNN"
    cfg.MODEL.ROI_BOX_HEAD.NAME = \
        "EmbeddingGroundingFastRCNNOutputLayers"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 5
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.EMBEDDING_BASED = True
    cfg.MODEL.ROI_BOX_HEAD.EMB_DIM = 8
    cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG = True
    cfg.MODEL.MMSS_HEAD.GROUNDING.ALIGNMENT_TEMPERATURE = 1.0
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 16
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_meta_arch(cfg)

    b, h, w = 2, 64, 64
    rng = np.random.RandomState(0)
    images = ImageBatch(
        image=jnp.array(rng.rand(b, h, w, 3).astype(np.float32) * 255),
        hw=jnp.array([[64, 64], [48, 56]]),
        orig_hw=jnp.array([[128, 128], [96, 112]]))
    gt = GtBatch(
        boxes=jnp.array([[[4.0, 4.0, 30.0, 30.0],
                          [10.0, 20.0, 40.0, 44.0]],
                         [[8.0, 8.0, 24.0, 24.0], [0.0, 0.0, 0.0, 0.0]]]),
        classes=jnp.array([[1, 3], [0, 0]], jnp.int32),
        mask=jnp.array([[True, True], [True, False]]))
    batch = DetectionBatch(images=images, gt=gt)
    # multi-token class embeddings: 6 classes (incl. bg), <=3 tokens
    per_class = [rng.randn(rng.randint(1, 4), 8).astype(np.float32)
                 for _ in range(5)]
    tokens = ClassTokenEmbeddings.from_ragged(per_class, 8)
    return cfg, model, batch, tokens


@pytest.mark.slow
def test_grounding_stt_trains(grounding_stt):
    cfg, model, batch, tokens = grounding_stt
    key = jax.random.PRNGKey(0)
    params = model.init(key, batch, tokens, key, method=model.losses)
    # the grounding predictor is really what got built
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    assert any("box_predictor" in n and "emb_pred" in n for n in names)

    def loss_fn(p):
        l = model.apply(p, batch, tokens, key, method=model.losses)
        return sum(jax.tree.leaves(l)), l

    (total, losses), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total))
    assert {"loss_cls", "loss_box_reg"} <= set(losses)
    gsum = sum(float(np.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(gsum) and gsum > 0


def test_grounding_stt_inference(grounding_stt):
    cfg, model, batch, tokens = grounding_stt
    key = jax.random.PRNGKey(1)
    params = model.init(key, batch, tokens, key, method=model.losses)
    dets = model.apply(params, batch, tokens, method=model.inference)
    assert dets.boxes.shape == (2, 10, 4)
    assert np.isfinite(np.asarray(dets.scores)).all()

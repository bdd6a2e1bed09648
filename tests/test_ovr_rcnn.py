"""End-to-end smoke tests for the STT meta-arch on tiny shapes."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from locov_tpu.config import get_cfg
from locov_tpu.models import build_meta_arch
from locov_tpu.structures.batches import (DetectionBatch, GtBatch,
                                          ImageBatch)


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "OvrRCNN"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 5
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.EMBEDDING_BASED = True
    cfg.MODEL.ROI_BOX_HEAD.EMB_DIM = 8
    cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG = True
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
        boxes=jnp.array([[[4.0, 4.0, 30.0, 30.0], [10.0, 20.0, 40.0, 44.0]],
                         [[8.0, 8.0, 24.0, 24.0], [0.0, 0.0, 0.0, 0.0]]]),
        classes=jnp.array([[1, 3], [0, 0]], jnp.int32),
        mask=jnp.array([[True, True], [True, False]]))
    batch = DetectionBatch(images=images, gt=gt)
    class_emb = jnp.array(rng.randn(6, 8).astype(np.float32))
    class_emb = class_emb.at[-1].set(0.0)  # background row is zeros
    return cfg, model, batch, class_emb


@pytest.mark.slow
def test_train_losses_finite_and_complete(tiny_setup):
    cfg, model, batch, class_emb = tiny_setup
    key = jax.random.PRNGKey(0)
    params = model.init(key, batch, class_emb, key, method=model.losses)
    losses = model.apply(params, batch, class_emb, key,
                         method=model.losses)
    expected = {"loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg"}
    assert set(losses) == expected
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


@pytest.mark.slow
def test_train_step_grads_flow(tiny_setup):
    cfg, model, batch, class_emb = tiny_setup
    key = jax.random.PRNGKey(1)
    params = model.init(key, batch, class_emb, key, method=model.losses)

    def loss_fn(p):
        l = model.apply(p, batch, class_emb, key, method=model.losses)
        return sum(jax.tree.leaves(l))

    g = jax.grad(loss_fn)(params)
    flat = jax.tree.leaves(jax.tree.map(lambda x: np.abs(x).sum(), g))
    total = sum(map(float, flat))
    assert np.isfinite(total) and total > 0


def test_inference_shapes_and_rescale(tiny_setup):
    cfg, model, batch, class_emb = tiny_setup
    key = jax.random.PRNGKey(2)
    params = model.init(key, batch, class_emb, key, method=model.losses)
    dets = model.apply(params, batch, class_emb, method=model.inference)
    assert dets.boxes.shape == (2, 10, 4)
    assert dets.scores.shape == (2, 10)
    b = np.asarray(dets.boxes)
    m = np.asarray(dets.mask)
    # boxes live in ORIGINAL image coordinates (2x the padded frame here)
    if m[0].any():
        assert b[0][m[0]].max() <= 128.0 + 1e-3
    if m[1].any():
        assert b[1][m[1], 2].max() <= 112.0 + 1e-3


def test_precomputed_proposals_paths(tiny_setup):
    """The RPN-less path (MODEL.PROPOSAL_GENERATOR.NAME =
    'PrecomputedProposals', reference ovr_rcnn.py:59-61): batch
    proposals feed the second stage directly, and a missing
    ProposalBatch raises an actionable config error — not an assert."""
    from locov_tpu.structures.batches import ProposalBatch

    cfg, _, batch, class_emb = tiny_setup
    cfg2 = cfg.clone()
    cfg2.defrost() if hasattr(cfg2, "defrost") else None
    cfg2.MODEL.PROPOSAL_GENERATOR.NAME = "PrecomputedProposals"
    model = build_meta_arch(cfg2)

    rng = np.random.RandomState(3)
    k = 8
    boxes = np.zeros((2, k, 4), np.float32)
    boxes[..., :2] = rng.rand(2, k, 2) * 20
    boxes[..., 2:] = boxes[..., :2] + 8 + rng.rand(2, k, 2) * 20
    props = ProposalBatch(
        boxes=jnp.asarray(boxes),
        objectness=jnp.asarray(rng.rand(2, k), jnp.float32),
        mask=jnp.ones((2, k), bool))
    pbatch = batch._replace(proposals=props)

    key = jax.random.PRNGKey(4)
    params = model.init(key, pbatch, class_emb, key, method=model.losses)
    losses = model.apply(params, pbatch, class_emb, key,
                         method=model.losses)
    # no RPN -> no RPN losses; detector losses present and finite
    assert set(losses) == {"loss_cls", "loss_box_reg"}
    for name, v in losses.items():
        assert np.isfinite(float(v)), name
    dets = model.apply(params, pbatch, class_emb, method=model.inference)
    assert dets.boxes.shape[0] == 2 and np.isfinite(
        np.asarray(dets.scores)).all()

    # config-reachable misconfiguration fails with a clear message
    with pytest.raises(ValueError, match="PrecomputedProposals"):
        model.apply(params, batch, class_emb, key, method=model.losses)

"""RPN unit tests: anchors vs d2 semantics, losses, proposal selection."""
import numpy as np
import jax
import jax.numpy as jnp

from locov_tpu.models import rpn as R
from locov_tpu.structures.batches import GtBatch


def _rpn_cfg(**kw):
    from locov_tpu.config import get_cfg
    cfg = get_cfg()
    c = R.RPNConfig.from_cfg(cfg)
    return c._replace(**kw) if kw else c


def test_cell_anchors_match_d2_formula():
    a = np.asarray(R.generate_cell_anchors([32], [0.5, 1.0, 2.0]))
    # ratio 0.5: w = sqrt(1024/0.5) = 45.25, h = 22.63
    w = a[:, 2] - a[:, 0]
    h = a[:, 3] - a[:, 1]
    np.testing.assert_allclose(w * h, 1024.0, rtol=1e-5)
    np.testing.assert_allclose(h / w, [0.5, 1.0, 2.0], rtol=1e-5)
    # centered at origin
    np.testing.assert_allclose(a[:, :2] + a[:, 2:], 0.0, atol=1e-5)


def test_grid_anchors_layout():
    cell = R.generate_cell_anchors([32, 64], [1.0])
    g = np.asarray(R.grid_anchors(cell, 2, 3, stride=16))
    assert g.shape == (2 * 3 * 2, 4)
    # first anchor at cell (0,0) equals the cell anchor
    np.testing.assert_allclose(g[0], np.asarray(cell[0]))
    # anchor at cell (0,1) shifted by stride in x
    np.testing.assert_allclose(g[2] - g[0], [16, 0, 16, 0])
    # anchor at row 1 shifted by stride in y
    np.testing.assert_allclose(g[6] - g[0], [0, 16, 0, 16])


def test_select_proposals_static_shapes():
    cfg = _rpn_cfg(pre_nms_topk_test=64, post_nms_topk_test=16)
    cell = R.generate_cell_anchors(cfg.sizes, cfg.aspect_ratios)
    gh = gw = 8
    anchors = R.grid_anchors(cell, gh, gw, cfg.stride)
    n = anchors.shape[0]
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (2, n))
    deltas = jax.random.normal(key, (2, n, 4)) * 0.1
    hw = jnp.array([[128, 128], [100, 90]])
    props = R.select_proposals(anchors, logits, deltas, hw, cfg,
                               training=False)
    assert props.boxes.shape == (2, 16, 4)
    assert props.mask.shape == (2, 16)
    b = np.asarray(props.boxes)
    m = np.asarray(props.mask)
    # clipped to per-image sizes
    assert b[0][m[0]].max() <= 128.0 + 1e-4
    assert b[1][m[1], 2].max() <= 90.0 + 1e-4
    assert b[1][m[1], 3].max() <= 100.0 + 1e-4
    # objectness sorted descending among valid
    o = np.asarray(props.objectness)[0][m[0]]
    assert (np.diff(o) <= 1e-6).all()


def test_rpn_losses_zero_when_perfect():
    """With deltas exactly encoding gt and confident logits, both losses
    should be near zero."""
    cfg = _rpn_cfg()
    cell = R.generate_cell_anchors([32], [1.0])
    anchors = R.grid_anchors(cell, 4, 4, 16)  # 16 anchors
    gt_box = jnp.array([[[14.0, 14.0, 50.0, 50.0]]])  # near anchor(1,1)
    gt = GtBatch(boxes=gt_box, classes=jnp.ones((1, 1), jnp.int32),
                 mask=jnp.ones((1, 1), bool))
    from locov_tpu.structures import boxes as box_ops
    iou = box_ops.pairwise_iou(gt_box[0], anchors)
    pos = np.asarray(iou[0] > 0.7) | (
        np.asarray(iou[0]) == np.asarray(iou[0]).max())
    perfect_deltas = box_ops.get_deltas(
        anchors, jnp.broadcast_to(gt_box[0, 0], anchors.shape),
        cfg.bbox_reg_weights)[None]
    logits = jnp.where(jnp.asarray(pos), 20.0, -20.0)[None]
    losses = R.rpn_losses(anchors, logits, perfect_deltas, gt, cfg,
                          jax.random.PRNGKey(0))
    assert float(losses["loss_rpn_cls"]) < 1e-4
    assert float(losses["loss_rpn_loc"]) < 1e-6


def test_rpn_losses_no_gt_image():
    cfg = _rpn_cfg()
    cell = R.generate_cell_anchors([32], [1.0])
    anchors = R.grid_anchors(cell, 4, 4, 16)
    gt = GtBatch(boxes=jnp.zeros((1, 3, 4)),
                 classes=jnp.zeros((1, 3), jnp.int32),
                 mask=jnp.zeros((1, 3), bool))
    logits = jnp.zeros((1, 16))
    deltas = jnp.zeros((1, 16, 4))
    losses = R.rpn_losses(anchors, logits, deltas, gt, cfg,
                          jax.random.PRNGKey(0))
    for v in losses.values():
        assert np.isfinite(float(v))
    # all background: box loss must be exactly 0
    assert float(losses["loss_rpn_loc"]) == 0.0


def test_backbone_freeze_at_stops_gradients():
    """FREEZE_AT=2 must zero grads for stem+res2 (d2 semantics) via
    stop_gradient — not just optimizer masking, which still pays the
    full backward through the frozen stages."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from locov_tpu.models.resnet import ResNetC4

    model = ResNetC4(out_features=("res4",), freeze_at=2)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                    jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    def loss(p):
        return (model.apply(p, x)["res4"] ** 2).sum()

    g = jax.grad(loss)(params)["params"]
    frozen = sum(float(jnp.abs(v).sum())
                 for k in ("stem", "res2")
                 for v in jax.tree.leaves(g[k]))
    live = sum(float(jnp.abs(v).sum())
               for k in ("res3", "res4")
               for v in jax.tree.leaves(g[k]))
    assert frozen == 0.0
    assert live > 0.0

"""Golden tests for box algebra against brute-force numpy references."""
import numpy as np
import jax.numpy as jnp

from locov_tpu.structures import boxes as B


def _rand_boxes(rng, n, size=100.0):
    xy = rng.rand(n, 2) * size
    wh = rng.rand(n, 2) * size * 0.5 + 1.0
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def _iou_ref(b1, b2):
    out = np.zeros((len(b1), len(b2)), np.float64)
    for i, a in enumerate(b1):
        for j, b in enumerate(b2):
            ix0, iy0 = max(a[0], b[0]), max(a[1], b[1])
            ix1, iy1 = min(a[2], b[2]), min(a[3], b[3])
            iw, ih = max(ix1 - ix0, 0), max(iy1 - iy0, 0)
            inter = iw * ih
            ua = ((a[2] - a[0]) * (a[3] - a[1])
                  + (b[2] - b[0]) * (b[3] - b[1]) - inter)
            out[i, j] = inter / ua if inter > 0 else 0.0
    return out


def test_pairwise_iou_matches_bruteforce(rng):
    b1 = _rand_boxes(rng, 23)
    b2 = _rand_boxes(rng, 17)
    got = np.asarray(B.pairwise_iou(jnp.array(b1), jnp.array(b2)))
    want = _iou_ref(b1, b2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_iou_degenerate_boxes_are_zero():
    b1 = jnp.array([[10.0, 10.0, 10.0, 20.0]])  # zero width
    b2 = jnp.array([[0.0, 0.0, 30.0, 30.0]])
    assert float(B.pairwise_iou(b1, b2)[0, 0]) == 0.0


def test_area_clip_centers(rng):
    b = _rand_boxes(rng, 11, size=50)
    a = np.asarray(B.area(jnp.array(b)))
    np.testing.assert_allclose(a, (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]),
                               rtol=1e-6)
    clipped = np.asarray(B.clip(jnp.array(b), (40, 45)))
    assert clipped[:, 0].min() >= 0 and clipped[:, 2].max() <= 45
    assert clipped[:, 3].max() <= 40
    c = np.asarray(B.centers(jnp.array(b)))
    np.testing.assert_allclose(c[:, 0], (b[:, 0] + b[:, 2]) / 2, rtol=1e-6)


def test_xywh_roundtrip(rng):
    b = _rand_boxes(rng, 9)
    back = np.asarray(B.xywh_to_xyxy(B.xyxy_to_xywh(jnp.array(b))))
    np.testing.assert_allclose(back, b, rtol=1e-6)


def test_deltas_roundtrip(rng):
    """apply_deltas(get_deltas(src, tgt), src) == tgt for any weights."""
    src = _rand_boxes(rng, 31)
    tgt = _rand_boxes(rng, 31)
    for weights in [(1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)]:
        d = B.get_deltas(jnp.array(src), jnp.array(tgt), weights)
        rec = np.asarray(B.apply_deltas(d, jnp.array(src), weights))
        np.testing.assert_allclose(rec, tgt, rtol=1e-4, atol=1e-3)


def test_apply_deltas_multiclass_shape(rng):
    src = jnp.array(_rand_boxes(rng, 7))
    deltas = jnp.array(rng.randn(7, 12).astype(np.float32) * 0.1)
    out = B.apply_deltas(deltas, src, (10.0, 10.0, 5.0, 5.0))
    assert out.shape == (7, 12)


def test_scale_clamp_limits_growth():
    src = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    deltas = jnp.array([[0.0, 0.0, 100.0, 100.0]])  # huge dw/dh
    out = np.asarray(B.apply_deltas(deltas, src, (1.0, 1.0, 1.0, 1.0)))
    w = out[0, 2] - out[0, 0]
    assert w <= 10.0 * 1000.0 / 16 + 1e-3


def test_batched_pairwise_iou(rng):
    b1 = np.stack([_rand_boxes(rng, 5) for _ in range(3)])
    b2 = np.stack([_rand_boxes(rng, 6) for _ in range(3)])
    got = np.asarray(B.pairwise_iou(jnp.array(b1), jnp.array(b2)))
    assert got.shape == (3, 5, 6)
    for i in range(3):
        np.testing.assert_allclose(got[i], _iou_ref(b1[i], b2[i]),
                                   rtol=1e-5, atol=1e-6)


def test_config_surface_merges_reference_yamls():
    from locov_tpu.config import config_path, get_cfg
    for name in ["coco_lsm.yaml", "coco_stt.yaml"]:
        cfg = get_cfg()
        cfg.merge_from_file(config_path(name))
        assert cfg.MODEL.RESNETS.DEPTH == 50
    cfg = get_cfg()
    cfg.merge_from_file(config_path("coco_lsm.yaml"))
    # yacs-style literal_eval of tuple-typed strings
    assert cfg.MODEL.MMSS_HEAD.TYPES == ("GroundingHead", "TransformerHead")
    assert cfg.MODEL.BACKBONE_PREFIX == ("backbone.body.",)
    assert cfg.SOLVER.STEPS == (45000, 60000, 80000)
    cfg.merge_from_list(["SOLVER.BASE_LR", "0.02", "MODEL.MASK_ON", "True"])
    assert cfg.SOLVER.BASE_LR == 0.02 and cfg.MODEL.MASK_ON is True
    cfg.freeze()
    try:
        cfg.SOLVER.BASE_LR = 1.0
        assert False, "frozen cfg must reject writes"
    except AttributeError:
        pass

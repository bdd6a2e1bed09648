"""Matcher/sampler/loss golden tests."""
import numpy as np
import jax
import jax.numpy as jnp

from locov_tpu.ops import matcher as M
from locov_tpu.ops import losses as L


def test_match_roi_semantics():
    # 2 gt, 4 proposals; ROI matcher: thresholds [0.5], labels [0, 1]
    quality = jnp.array([
        [0.9, 0.4, 0.55, 0.0],
        [0.2, 0.6, 0.50, 0.0],
    ])
    gt_mask = jnp.array([True, True])
    idx, lab = M.match(quality, gt_mask, [0.5], [0, 1])
    np.testing.assert_array_equal(np.asarray(idx), [0, 1, 0, 0])
    np.testing.assert_array_equal(np.asarray(lab), [1, 1, 1, 0])


def test_match_rpn_with_ignore_band_and_low_quality():
    quality = jnp.array([
        [0.65, 0.2, 0.75, 0.1],
    ])
    gt_mask = jnp.array([True])
    idx, lab = M.match(quality, gt_mask, [0.3, 0.7], [0, -1, 1],
                       allow_low_quality_matches=False)
    np.testing.assert_array_equal(np.asarray(lab), [-1, 0, 1, 0])
    # low-quality: the best prediction for a gt becomes positive even
    # when below threshold
    quality2 = jnp.array([[0.25, 0.2, 0.1, 0.05]])
    _, lab2 = M.match(quality2, gt_mask, [0.3, 0.7], [0, -1, 1],
                      allow_low_quality_matches=True)
    np.testing.assert_array_equal(np.asarray(lab2), [1, 0, 0, 0])


def test_match_padded_gt_rows_ignored():
    quality = jnp.array([
        [0.9, 0.1],
        [0.99, 0.98],  # padded row — must not win
    ])
    gt_mask = jnp.array([True, False])
    idx, lab = M.match(quality, gt_mask, [0.5], [0, 1])
    np.testing.assert_array_equal(np.asarray(idx), [0, 0])
    np.testing.assert_array_equal(np.asarray(lab), [1, 0])


def test_match_no_gt_all_background():
    quality = jnp.zeros((3, 5))
    idx, lab = M.match(quality, jnp.zeros(3, bool), [0.5], [0, 1])
    assert np.asarray(lab).sum() == 0


def test_subsample_labels_counts_and_validity():
    rng = jax.random.PRNGKey(0)
    labels = jnp.array([1] * 10 + [0] * 50 + [-1] * 40)
    idx, is_pos, valid = M.subsample_labels(labels, 32, 0.25, rng)
    idx, is_pos, valid = map(np.asarray, (idx, is_pos, valid))
    assert valid.all()
    assert is_pos.sum() == 8  # min(10, 32*0.25)
    lab = np.asarray(labels)[idx]
    assert (lab[is_pos] == 1).all()
    assert (lab[~is_pos] == 0).all()
    assert len(set(idx.tolist())) == 32  # no duplicates


def test_subsample_labels_few_positives():
    rng = jax.random.PRNGKey(1)
    labels = jnp.array([1] * 2 + [0] * 3 + [-1] * 20)
    idx, is_pos, valid = M.subsample_labels(labels, 16, 1.0, rng)
    idx, is_pos, valid = map(np.asarray, (idx, is_pos, valid))
    # positive_fraction=1.0: all 2 positives + 3 negatives fill, rest invalid
    assert is_pos.sum() == 2
    assert valid.sum() == 5


def test_smooth_l1_matches_fvcore_semantics():
    pred = jnp.array([0.0, 1.0, 3.0])
    tgt = jnp.array([0.5, 0.0, 0.0])
    # beta=0 -> L1
    np.testing.assert_allclose(np.asarray(L.smooth_l1(pred, tgt, 0.0)),
                               [0.5, 1.0, 3.0])
    got = np.asarray(L.smooth_l1(pred, tgt, 1.0))
    np.testing.assert_allclose(got, [0.125, 0.5, 2.5])


def test_giou_identical_boxes_zero():
    b = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    np.testing.assert_allclose(np.asarray(L.giou(b, b)), [0.0], atol=1e-6)
    far = jnp.array([[20.0, 0.0, 30.0, 10.0]])
    v = float(L.giou(b, far)[0])
    assert 1.0 < v < 2.0  # disjoint boxes: loss in (1, 2)


def test_mean_cross_entropy_ignore_index():
    logits = jnp.array([[10.0, 0.0], [0.0, 10.0], [5.0, 5.0]])
    labels = jnp.array([0, 1, -1])
    v = float(L.mean_cross_entropy(logits, labels))
    assert v < 1e-3  # ignored row contributes nothing
    assert float(L.mean_cross_entropy(logits, jnp.array([-1, -1, -1]))) == 0.0


def test_masked_softmax_fully_masked_row():
    x = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    m = jnp.array([[True, True], [False, False]])
    out = np.asarray(L.masked_softmax(x, m, axis=1))
    np.testing.assert_allclose(out[1], [0.0, 0.0])
    np.testing.assert_allclose(out[0].sum(), 1.0, rtol=1e-6)


def test_kl_div_batchmean_matches_torch_formula():
    q_log = jnp.log(jnp.array([[0.7, 0.3], [0.5, 0.5]]))
    p = jnp.array([[0.6, 0.4], [0.9, 0.1]])
    got = float(L.kl_div_batchmean(q_log, p))
    want = float((p * (jnp.log(p) - q_log)).sum() / 2)
    np.testing.assert_allclose(got, want, rtol=1e-6)

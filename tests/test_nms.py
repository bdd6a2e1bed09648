"""NMS vs a brute-force greedy reference (torchvision semantics)."""
import numpy as np
import jax.numpy as jnp

from locov_tpu.ops import nms as N


def _iou(bi, bj):
    ix0, iy0 = max(bi[0], bj[0]), max(bi[1], bj[1])
    ix1, iy1 = min(bi[2], bj[2]), min(bi[3], bj[3])
    inter = max(ix1 - ix0, 0) * max(iy1 - iy0, 0)
    a = (bi[2] - bi[0]) * (bi[3] - bi[1])
    b = (bj[2] - bj[0]) * (bj[3] - bj[1])
    return inter / (a + b - inter) if inter > 0 else 0.0


def _greedy_nms_ref(boxes, scores, thresh):
    """Plain O(N^2) sequential greedy NMS — the ground truth."""
    order = np.argsort(-scores, kind="stable")
    suppressed = np.zeros(len(boxes), bool)
    keep = []
    for pos, i in enumerate(order):
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order[pos + 1:]:
            if not suppressed[j] and _iou(boxes[i], boxes[j]) > thresh:
                suppressed[j] = True
    return sorted(keep)


def _rand(rng, n, clustered=True):
    if clustered:
        # clusters of heavily-overlapping boxes — the hard case
        centers = rng.rand(max(n // 8, 1), 2) * 80
        idx = rng.randint(len(centers), size=n)
        c = centers[idx] + rng.randn(n, 2) * 4
    else:
        c = rng.rand(n, 2) * 100
    wh = rng.rand(n, 2) * 20 + 5
    boxes = np.concatenate([c - wh / 2, c + wh / 2], 1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    return boxes, scores


def test_nms_matches_greedy_reference(rng):
    for trial in range(5):
        n = [17, 100, 257, 300, 513][trial]
        boxes, scores = _rand(rng, n)
        valid = np.ones(n, bool)
        keep = np.asarray(
            N.nms_mask(jnp.array(boxes), jnp.array(scores),
                       jnp.array(valid), 0.5))
        got = sorted(np.nonzero(keep)[0].tolist())
        want = _greedy_nms_ref(boxes, scores, 0.5)
        assert got == want, f"trial {trial}: {got[:10]} vs {want[:10]}"


def test_nms_respects_validity_mask(rng):
    boxes, scores = _rand(rng, 64)
    valid = np.zeros(64, bool)
    valid[:20] = True
    keep = np.asarray(
        N.nms_mask(jnp.array(boxes), jnp.array(scores), jnp.array(valid),
                   0.5))
    assert not keep[20:].any()
    want = _greedy_nms_ref(boxes[:20], scores[:20], 0.5)
    assert sorted(np.nonzero(keep[:20])[0].tolist()) == want


def test_nms_topk_returns_sorted_survivors(rng):
    boxes, scores = _rand(rng, 120)
    valid = np.ones(120, bool)
    idx, ok = N.nms_topk(jnp.array(boxes), jnp.array(scores),
                         jnp.array(valid), 0.5, 16)
    idx, ok = np.asarray(idx), np.asarray(ok)
    surv = _greedy_nms_ref(boxes, scores, 0.5)
    surv_sorted = sorted(surv, key=lambda i: -scores[i])[:16]
    assert idx[ok].tolist() == surv_sorted[:ok.sum()]


def test_batched_nms_is_per_class(rng):
    boxes, scores = _rand(rng, 80)
    classes = rng.randint(0, 3, size=80)
    valid = np.ones(80, bool)
    keep = np.asarray(
        N.batched_nms_mask(jnp.array(boxes), jnp.array(scores),
                           jnp.array(classes), jnp.array(valid), 0.5))
    for c in range(3):
        m = classes == c
        want = _greedy_nms_ref(boxes[m], scores[m], 0.5)
        got = np.nonzero(keep[m])[0].tolist()
        assert sorted(got) == want


def test_batched_nms_negative_coords_keep_classes_disjoint():
    """The bare torchvision offset trick (class * (max+1)) makes a
    negative-coordinate box of class 1 collide with a high-coordinate
    box of class 0; the shifted form must keep them independent."""
    boxes = np.array([[90.0, 90.0, 100.0, 100.0],
                      [-11.0, -11.0, -1.0, -1.0]], np.float32)
    scores = np.array([0.9, 0.5], np.float32)
    classes = np.array([0, 1])
    keep = np.asarray(N.batched_nms_mask(
        jnp.array(boxes), jnp.array(scores), jnp.array(classes),
        jnp.ones(2, bool), 0.5))
    assert keep.tolist() == [True, True]


def test_nms_topk_under_shard_map(rng):
    """The compacted stop_after while_loop must be well-typed under
    shard_map (its initial carries must be device-varying) — this is
    the RPN proposal path inside every sharded train step; a plain
    -zeros carry aborted the STT integration test."""
    import jax
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh
    from jax.sharding import PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("data",))
    B, n, k = 8, 900, 16  # 4 tiles: exercises the compacted path
    boxes, scores = zip(*[_rand(rng, n) for _ in range(B)])
    boxes = np.stack(boxes)
    scores = np.stack(scores)
    valid = np.ones((B, n), bool)

    def f(b, s, v):
        idx, ok = N.nms_topk_batched(b, s, v, 0.5, k)
        return idx, ok

    idx, ok = jax.jit(shard_map(
        f, mesh=mesh, in_specs=(P("data"), P("data"), P("data")),
        out_specs=(P("data"), P("data"))))(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid))
    idx, ok = np.asarray(idx), np.asarray(ok)
    for r in range(B):
        surv = _greedy_nms_ref(boxes[r], scores[r], 0.5)
        want = sorted(surv, key=lambda i: -scores[r][i])[:k]
        assert idx[r][ok[r]].tolist() == want[:ok[r].sum()]


def test_nms_all_invalid():
    boxes = jnp.zeros((32, 4))
    keep = np.asarray(N.nms_mask(boxes, jnp.zeros(32), jnp.zeros(32, bool),
                                 0.5))
    assert not keep.any()


def test_nms_topk_compacted_buffer_exact(rng):
    """The stop_after path suppresses against a compacted survivor
    buffer. Exactness of the returned top-k across buffer-relevant
    regimes: sparse boxes (buffer fills fast, sweep stops early),
    clustered boxes (few survivors, sweep runs every tile), and a
    batch row mixing both; several tiles each."""
    for clustered, k in [(False, 12), (True, 12), (False, 300),
                         (True, 300)]:
        n = 1100  # 5 tiles
        b1, s1 = _rand(rng, n, clustered=clustered)
        b2, s2 = _rand(rng, n, clustered=not clustered)
        boxes = np.stack([b1, b2])
        scores = np.stack([s1, s2])
        valid = np.ones((2, n), bool)
        idx, ok = N.nms_topk_batched(jnp.array(boxes), jnp.array(scores),
                                     jnp.array(valid), 0.5, k)
        idx, ok = np.asarray(idx), np.asarray(ok)
        for r in range(2):
            surv = _greedy_nms_ref(boxes[r], scores[r], 0.5)
            want = sorted(surv, key=lambda i: -scores[r][i])[:k]
            got = idx[r][ok[r]].tolist()
            assert got == want[:len(got)] and len(got) == len(want), \
                f"clustered={clustered} k={k} row={r}"


def _per_class_greedy_ref(boxes, scores, classes, thresh):
    """Ground truth for per-class NMS: greedy within each class."""
    surv = []
    for c in np.unique(classes):
        m = np.nonzero(classes == c)[0]
        surv += [int(m[i]) for i in
                 _greedy_nms_ref(boxes[m], scores[m], thresh)]
    return sorted(surv)


def test_batched_nms_compacted_buffer_exact(rng):
    """Class-aware compacted stop_after path (the fast_rcnn inference
    path: thousands of candidates, per-class suppression, top-k
    consumer). The returned top-k must match the per-class greedy
    reference across sparse/clustered regimes and several tiles."""
    for clustered, k, ncls in [(False, 16, 3), (True, 16, 3),
                               (False, 100, 65), (True, 100, 65)]:
        n = 1100  # 5 tiles -> compacted path
        b1, s1 = _rand(rng, n, clustered=clustered)
        b2, s2 = _rand(rng, n, clustered=not clustered)
        boxes = np.stack([b1, b2])
        scores = np.stack([s1, s2])
        classes = rng.randint(0, ncls, size=(2, n))
        valid = np.ones((2, n), bool)
        keep = np.asarray(N.batched_nms_mask_batched(
            jnp.array(boxes), jnp.array(scores), jnp.array(classes),
            jnp.array(valid), 0.5, stop_after=k))
        for r in range(2):
            surv = _per_class_greedy_ref(boxes[r], scores[r],
                                         classes[r], 0.5)
            want = sorted(surv, key=lambda i: -scores[r][i])[:k]
            kept_scores = np.where(keep[r], scores[r], -np.inf)
            got = np.argsort(-kept_scores, kind="stable")[:k]
            got = [int(i) for i in got if kept_scores[i] > -np.inf]
            assert got == want, \
                f"clustered={clustered} k={k} ncls={ncls} row={r}"


def test_batched_nms_compacted_equals_full(rng):
    """stop_after top-k == untruncated per-class NMS top-k."""
    n, k = 900, 24
    boxes, scores = _rand(rng, n)
    classes = rng.randint(0, 5, size=n)
    valid = np.ones(n, bool)
    full = np.asarray(N.batched_nms_mask_batched(
        jnp.array(boxes)[None], jnp.array(scores)[None],
        jnp.array(classes)[None], jnp.array(valid)[None], 0.5))[0]
    fast = np.asarray(N.batched_nms_mask_batched(
        jnp.array(boxes)[None], jnp.array(scores)[None],
        jnp.array(classes)[None], jnp.array(valid)[None], 0.5,
        stop_after=k))[0]
    topk = lambda m: np.argsort(-np.where(m, scores, -np.inf),
                                kind="stable")[:k].tolist()
    assert topk(fast) == topk(full)


def test_nms_topk_early_stop_exact_across_tiles(rng):
    """stop_after: the tile sweep halts once every row has max_out
    survivors; the returned top-k must equal the untruncated NMS's
    top-k on a box set spanning several 256-box tiles."""
    n = 900  # 4 tiles
    boxes, scores = _rand(rng, n)
    valid = np.ones(n, bool)
    full = N.nms_mask_batched(jnp.array(boxes)[None],
                              jnp.array(scores)[None],
                              jnp.array(valid)[None], 0.5)
    kept_scores = np.where(np.asarray(full)[0], scores, -np.inf)
    want = np.argsort(-kept_scores)[:20]
    idx, ok = N.nms_topk(jnp.array(boxes), jnp.array(scores),
                         jnp.array(valid), 0.5, 20)
    assert np.asarray(ok).all()
    assert np.asarray(idx).tolist() == want.tolist()

"""NMS results must be independent of the suppression tile size
(ops/nms.py picks the tile from stop_after — a perf knob only)."""
import jax
import jax.numpy as jnp
import numpy as np

import locov_tpu.ops.nms as nms_ops


def _random_boxes(key, b, n, span=200.0):
    k1, k2, k3 = jax.random.split(key, 3)
    xy = jax.random.uniform(k1, (b, n, 2)) * span
    wh = jax.random.uniform(k2, (b, n, 2)) * 40.0 + 1.0
    boxes = jnp.concatenate([xy, xy + wh], axis=-1)
    scores = jax.random.uniform(k3, (b, n))
    return boxes, scores


def test_keep_mask_tile_invariant(monkeypatch):
    b, n, stop = 2, 1600, 64
    boxes, scores = _random_boxes(jax.random.PRNGKey(0), b, n)
    valid = jnp.ones((b, n), bool)

    outs = {}
    for tile in (128, 256):
        monkeypatch.setattr(nms_ops, "_pick_tile", lambda s, t=tile: t)
        keep = nms_ops.nms_mask_batched(boxes, scores, valid, 0.5,
                                        stop_after=stop)
        # only the top-`stop` survivors are contractually exact
        kept_scores = jnp.where(keep, scores, -1.0)
        top, idx = jax.lax.top_k(kept_scores, stop)
        outs[tile] = np.asarray(jnp.sort(idx, axis=1))
    np.testing.assert_array_equal(outs[128], outs[256])

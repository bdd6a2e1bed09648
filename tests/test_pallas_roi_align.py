"""Pallas fused ROIAlign vs the XLA formulation (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp

from locov_tpu.ops.pallas_roi_align import roi_align_pallas
from locov_tpu.ops.roi_align import roi_align_batched


def _data(rng, b=2, h=24, w=20, c=8, n=11):
    feat = rng.randn(b, h, w, c).astype(np.float32)
    xy = (rng.rand(b, n, 2) * 150).astype(np.float32)
    boxes = np.concatenate(
        [xy, xy + rng.rand(b, n, 2).astype(np.float32) * 100 + 8], -1)
    return jnp.array(feat), jnp.array(boxes)


def test_pallas_matches_xla_forward(rng):
    feat, boxes = _data(rng)
    want = roi_align_batched(feat, boxes, 1 / 8, pooled=7,
                             sampling_ratio=2)
    got = roi_align_pallas(feat, boxes, 1 / 8, 7, 2, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas_backward_matches_xla(rng):
    feat, boxes = _data(rng)

    def loss_p(f):
        return (roi_align_pallas(f, boxes, 1 / 8, 7, 2, True) ** 2).sum()

    def loss_x(f):
        out = roi_align_batched(f, boxes, 1 / 8, pooled=7,
                                sampling_ratio=2)
        return (out.astype(jnp.float32) ** 2).sum()

    gp = np.asarray(jax.grad(loss_p)(feat))
    gx = np.asarray(jax.grad(loss_x)(feat))
    np.testing.assert_allclose(gp, gx, rtol=1e-4, atol=1e-4)


def test_pallas_nondivisible_shapes(rng):
    # N and H not multiples of the block sizes
    feat, boxes = _data(rng, b=1, h=13, w=20, c=8, n=5)
    want = roi_align_batched(feat, boxes, 1 / 4, pooled=7,
                             sampling_ratio=2)
    got = roi_align_pallas(feat, boxes, 1 / 4, 7, 2, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

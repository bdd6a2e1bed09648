"""ROIAlign vs a direct per-sample-point numpy port of the
torchvision/detectron2 ROIAlignV2 (aligned=True) algorithm."""
import numpy as np
import jax.numpy as jnp
import pytest

from locov_tpu.ops.roi_align import (roi_align, roi_align_batched,
                                     roi_align_batched_int8,
                                     roi_align_batched_quant)


def _bilinear(feat, y, x):
    h, w = feat.shape[:2]
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(feat.shape[2])
    y = min(max(y, 0.0), h - 1)
    x = min(max(x, 0.0), w - 1)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    return (feat[y0, x0] * (1 - ly) * (1 - lx) + feat[y0, x1] * (1 - ly) * lx
            + feat[y1, x0] * ly * (1 - lx) + feat[y1, x1] * ly * lx)


def _roi_align_ref(feat, boxes, scale, pooled, ratio):
    n = len(boxes)
    c = feat.shape[2]
    out = np.zeros((n, pooled, pooled, c))
    for ni, box in enumerate(boxes):
        x0 = box[0] * scale - 0.5
        y0 = box[1] * scale - 0.5
        bw = box[2] * scale - 0.5 - x0
        bh = box[3] * scale - 0.5 - y0
        bin_h, bin_w = bh / pooled, bw / pooled
        for ph in range(pooled):
            for pw in range(pooled):
                acc = np.zeros(c)
                for iy in range(ratio):
                    for ix in range(ratio):
                        y = y0 + (ph + (iy + 0.5) / ratio) * bin_h
                        x = x0 + (pw + (ix + 0.5) / ratio) * bin_w
                        acc += _bilinear(feat, y, x)
                out[ni, ph, pw] = acc / (ratio * ratio)
    return out


def test_roi_align_matches_reference(rng):
    feat = rng.randn(25, 31, 5).astype(np.float32)
    boxes = np.array([
        [0.0, 0.0, 100.0, 100.0],
        [13.0, 27.0, 200.0, 190.0],
        [50.0, 50.0, 60.0, 65.0],      # small box
        [-10.0, -10.0, 30.0, 30.0],    # partially outside
        [300.0, 300.0, 400.0, 400.0],  # fully outside -> zeros
    ], np.float32)
    got = np.asarray(roi_align(jnp.array(feat), jnp.array(boxes),
                               spatial_scale=1.0 / 8, pooled=7,
                               sampling_ratio=2, chunk=4))
    want = _roi_align_ref(feat, boxes, 1.0 / 8, 7, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_roi_align_batched_shape(rng):
    feat = rng.randn(2, 16, 16, 3).astype(np.float32)
    boxes = (rng.rand(2, 10, 4) * 60).astype(np.float32)
    boxes[..., 2:] += boxes[..., :2]
    out = roi_align_batched(jnp.array(feat), jnp.array(boxes), 1.0 / 4,
                            pooled=7, sampling_ratio=2, chunk=8)
    assert out.shape == (2, 10, 7, 7, 3)


@pytest.mark.parametrize("sampling_ratio,chunk", [(0, 200), (2, 200),
                                                  (0, 8)])
def test_roi_align_int8_parity_vs_quant(rng, sampling_ratio, chunk):
    """roi_align_batched_int8 (full int8xint8 contractions, TPU.
    INT8_ROIALIGN default) vs roi_align_batched_quant (exact float
    interpolation, int8 output epilogue) on identical inputs: same
    output scale, dequantized values within int8 resolution. Error
    budget: feature quantization <= s_f/2 (pooled values are convex
    combinations of samples), per-row int8 weight quantization of kx
    and of ky <= ~1*s_f each (error <= nnz*(rowmax/254)*amax_in, and
    nnz*rowmax <= ~2 for hat-function rows summing to 1), the
    intermediate requantize <= s_f/2, the output round <= s_pool/2 —
    ~3.5 quantization steps of the larger scale total (measured worst
    case on the production device shapes: 1.7 steps)."""
    feat = (rng.randn(2, 24, 28, 16) * 3.0).astype(np.float32)
    boxes = (rng.rand(2, 25, 4) * 80).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.rand(2, 25, 2) * 60 + 2
    boxes[0, 3] = [10.0, 10.0, 10.0, 10.0]  # degenerate (zero-size)
    feat_j, boxes_j = jnp.array(feat), jnp.array(boxes)

    amax_in = jnp.float32(np.abs(feat).max())
    pooled_f = np.asarray(roi_align_batched(
        feat_j, boxes_j, 0.25, pooled=7,
        sampling_ratio=sampling_ratio, chunk=chunk))
    amax_pool = jnp.float32(np.abs(pooled_f).max())

    q_ref, s_ref = roi_align_batched_quant(
        feat_j, boxes_j, 0.25, amax_pool, pooled=7,
        sampling_ratio=sampling_ratio, chunk=chunk)
    q8, s8 = roi_align_batched_int8(
        feat_j, boxes_j, 0.25, amax_in, amax_pool, pooled=7,
        sampling_ratio=sampling_ratio, chunk=chunk)

    assert q8.dtype == jnp.int8 and q8.shape == q_ref.shape
    np.testing.assert_allclose(float(s8), float(s_ref), rtol=1e-6)

    s_f = float(amax_in) / 127.0
    s_p = float(amax_pool) / 127.0
    deq8 = np.asarray(q8, np.float32) * float(s8)
    deqr = np.asarray(q_ref, np.float32) * float(s_ref)
    diff = np.abs(deq8 - deqr)
    assert diff.max() <= 3.5 * max(s_f, s_p) + 1e-6
    assert diff.mean() <= 0.5 * max(s_f, s_p)
    if sampling_ratio == 0:
        # adaptive mode: degenerate box -> empty d2 sampling loop ->
        # zero output, preserved through the int8 path (fixed-ratio
        # mode instead samples the collapsed point, like torchvision)
        np.testing.assert_array_equal(np.asarray(q8)[0, 3], 0)


def test_roi_align_exact_on_constant(rng):
    """A constant feature map must pool to that constant everywhere the
    box lies inside the map."""
    feat = np.full((20, 20, 1), 3.25, np.float32)
    boxes = np.array([[8.0, 8.0, 64.0, 64.0]], np.float32)
    out = np.asarray(roi_align(jnp.array(feat), jnp.array(boxes), 0.25,
                               pooled=7, sampling_ratio=2))
    np.testing.assert_allclose(out, 3.25, rtol=1e-5)

"""ROIAlign as separable interpolation matmuls (TPU-native).

Replaces detectron2's C++/CUDA ``ROIAlign`` (``detectron2._C``, wrapped
by ``ROIPooler`` — reference call sites ``roi_emb_heads.py:182-187,
243-245``). Bilinear sampling is separable, so instead of 4-point
gathers per sample we build per-box 1-D interpolation matrices
Ky: [P, H], Kx: [P, W] (sampling-point hat weights, averaged over the
sampling grid) and compute

    crop[n] = Ky[n] @ F @ Kx[n]^T        (einsum, per channel)

which runs on the MXU instead of the scatter/gather units — the whole
op becomes two dense contractions per box chunk. Numerics follow
ROIAlignV2 (aligned=True, half-pixel offset) with torchvision's border
rules: samples outside [-1, dim] contribute zero, in-range samples
clamp to [0, dim-1].
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _interp_matrix(coords: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Average bilinear hat weights for sample coordinates.

    coords: [N, P, S] continuous sample positions along one axis.
    Returns [N, P, dim] weights averaged over the S samples per bin.
    """
    outside = (coords < -1.0) | (coords > dim)
    c = jnp.clip(coords, 0.0, dim - 1.0)
    low = jnp.floor(c)
    frac = c - low
    # when low == dim-1, high collapses onto low (weight 1 there)
    high = jnp.minimum(low + 1.0, dim - 1.0)
    w_low = jnp.where(outside, 0.0, 1.0 - frac)
    w_high = jnp.where(outside, 0.0, frac)

    grid = jnp.arange(dim, dtype=coords.dtype)  # [dim]
    onehot_low = (low[..., None] == grid).astype(coords.dtype)
    onehot_high = (high[..., None] == grid).astype(coords.dtype)
    w = w_low[..., None] * onehot_low + w_high[..., None] * onehot_high
    return w.mean(axis=2)  # average over sampling points


def _sample_coords(lo: jnp.ndarray, size: jnp.ndarray, pooled: int,
                   ratio: int) -> jnp.ndarray:
    """Continuous sample positions: for bin p and sample s,
    lo + (p + (s + 0.5)/ratio) * bin_size. lo/size: [N]."""
    bin_size = size / pooled  # [N]
    p = jnp.arange(pooled, dtype=lo.dtype)[None, :, None]
    s = (jnp.arange(ratio, dtype=lo.dtype)[None, None, :] + 0.5) / ratio
    return lo[:, None, None] + (p + s) * bin_size[:, None, None]


@partial(jax.jit, static_argnames=("pooled", "sampling_ratio", "chunk",
                                   "precision"))
def roi_align_batched(features: jnp.ndarray, boxes: jnp.ndarray,
                      spatial_scale: float, pooled: int = 14,
                      sampling_ratio: int = 2, chunk: int = 32,
                      precision: str = "highest") -> jnp.ndarray:
    """Batched ROIAlign: features [B, H, W, C], boxes [B, N, 4] ->
    [B, N, pooled, pooled, C].

    The batch is a native leading dim of the chunked einsums (a
    lax.map under vmap is an XLA compile-time hazard on TPU); boxes are
    processed in chunks of ``chunk`` to bound the [B, chunk, P, W, C]
    intermediate."""
    b, h, w = features.shape[0], features.shape[1], features.shape[2]
    n = boxes.shape[1]
    sr = max(int(sampling_ratio), 1)
    # aligned=True (ROIAlignV2): half-pixel correction, no size clamping
    x0 = boxes[..., 0] * spatial_scale - 0.5
    y0 = boxes[..., 1] * spatial_scale - 0.5
    bw = boxes[..., 2] * spatial_scale - 0.5 - x0
    bh = boxes[..., 3] * spatial_scale - 0.5 - y0

    flat = lambda v: v.reshape(b * n)
    ky = _interp_matrix(_sample_coords(flat(y0), flat(bh), pooled, sr),
                        h).reshape(b, n, pooled, h)
    kx = _interp_matrix(_sample_coords(flat(x0), flat(bw), pooled, sr),
                        w).reshape(b, n, pooled, w)

    pad = (-n) % chunk
    if pad:
        ky = jnp.pad(ky, ((0, 0), (0, pad), (0, 0), (0, 0)))
        kx = jnp.pad(kx, ((0, 0), (0, pad), (0, 0), (0, 0)))
    nchunks = (n + pad) // chunk
    # [nchunks, B, chunk, P, dim] so lax.map scans over chunks
    ky = jnp.moveaxis(ky.reshape(b, nchunks, chunk, pooled, h), 1, 0)
    kx = jnp.moveaxis(kx.reshape(b, nchunks, chunk, pooled, w), 1, 0)

    # "highest" reproduces exact f32 interpolation (golden tests, CPU
    # and import-parity paths); "default" lets the MXU run bf16 passes,
    # ~6x faster — appropriate when the features are bf16 anyway.
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)

    def do_chunk(k):
        ky_c, kx_c = k  # [B, chunk, P, dim]
        t = jnp.einsum("bnph,bhwc->bnpwc", ky_c, features,
                       preferred_element_type=jnp.float32,
                       precision=prec)
        return jnp.einsum("bnpwc,bnqw->bnpqc", t, kx_c,
                          preferred_element_type=jnp.float32,
                          precision=prec)

    if nchunks == 1:
        out = do_chunk((ky[0], kx[0]))[None]
    else:
        out = jax.lax.map(do_chunk, (ky, kx))
    out = jnp.moveaxis(out, 0, 1).reshape(b, nchunks * chunk, pooled,
                                          pooled, features.shape[3])
    return out[:, :n].astype(features.dtype)


def roi_align(features: jnp.ndarray, boxes: jnp.ndarray,
              spatial_scale: float, pooled: int = 14,
              sampling_ratio: int = 2, chunk: int = 32) -> jnp.ndarray:
    """Single-image wrapper: [H, W, C], [N, 4] -> [N, P, P, C]."""
    return roi_align_batched(features[None], boxes[None], spatial_scale,
                             pooled, sampling_ratio, chunk)[0]

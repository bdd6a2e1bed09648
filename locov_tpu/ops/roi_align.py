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


@partial(jax.jit, static_argnames=("pooled", "sampling_ratio", "chunk"))
def roi_align(features: jnp.ndarray, boxes: jnp.ndarray,
              spatial_scale: float, pooled: int = 14,
              sampling_ratio: int = 2, chunk: int = 32) -> jnp.ndarray:
    """ROIAlign for a single image.

    features: [H, W, C]; boxes: [N, 4] XYXY in input-image coords.
    Returns [N, pooled, pooled, C]. Boxes are processed in chunks to
    bound the [chunk, P, W, C] intermediate.
    """
    h, w = features.shape[0], features.shape[1]
    sr = max(int(sampling_ratio), 1)
    # aligned=True (ROIAlignV2): half-pixel correction, no size clamping
    x0 = boxes[:, 0] * spatial_scale - 0.5
    y0 = boxes[:, 1] * spatial_scale - 0.5
    bw = boxes[:, 2] * spatial_scale - 0.5 - x0
    bh = boxes[:, 3] * spatial_scale - 0.5 - y0

    ky = _interp_matrix(_sample_coords(y0, bh, pooled, sr), h)  # [N, P, H]
    kx = _interp_matrix(_sample_coords(x0, bw, pooled, sr), w)  # [N, P, W]

    n = boxes.shape[0]
    pad = (-n) % chunk
    if pad:
        ky = jnp.pad(ky, ((0, pad), (0, 0), (0, 0)))
        kx = jnp.pad(kx, ((0, pad), (0, 0), (0, 0)))
    ky = ky.reshape(-1, chunk, pooled, h)
    kx = kx.reshape(-1, chunk, pooled, w)

    def do_chunk(k):
        # HIGHEST: interpolation weights are exact hat fractions; bf16
        # MXU passes here cost ~nothing (ROIAlign is <5% of step FLOPs)
        # but visibly degrade pooled-feature fidelity.
        ky_c, kx_c = k
        t = jnp.einsum("nph,hwc->npwc", ky_c, features,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum("npwc,nqw->npqc", t, kx_c,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

    out = jax.lax.map(do_chunk, (ky, kx))
    out = out.reshape(-1, pooled, pooled, features.shape[2])
    return out[:n].astype(features.dtype)


def roi_align_batched(features: jnp.ndarray, boxes: jnp.ndarray,
                      spatial_scale: float, pooled: int = 14,
                      sampling_ratio: int = 2,
                      chunk: int = 32) -> jnp.ndarray:
    """vmap over the batch: features [B, H, W, C], boxes [B, N, 4] ->
    [B, N, pooled, pooled, C]."""
    fn = partial(roi_align, spatial_scale=spatial_scale, pooled=pooled,
                 sampling_ratio=sampling_ratio, chunk=chunk)
    return jax.vmap(fn)(features, boxes)

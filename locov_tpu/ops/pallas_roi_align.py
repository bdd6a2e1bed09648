"""Pallas TPU kernel: fused ROIAlign.

The XLA formulation (``ops/roi_align.py``) computes
``t = Ky @ F`` then ``out = t @ Kx^T`` per box chunk; XLA materializes
the ``[chunk, P, W, C]`` intermediate in HBM (~8.6 GB of round-trip
traffic per LSM step at reference shapes). This kernel fuses both
contractions: the grid is (batch, box-block, H-tile) with the H-tile
innermost so the per-box-block output accumulator stays resident in
VMEM across the reduction; each step DMAs one ``[Th, W, C]`` feature
tile and contracts it against the interpolation matrices on the MXU.
HBM traffic drops to features x (N / box-block) + outputs.

Numerics: interpolation weights are computed exactly (f32 hat
fractions, same `_interp_matrix` as the XLA path); feature contractions
run on the MXU with f32 accumulation.

Forward-only kernel with a custom VJP: the backward pass w.r.t.
features is the single contraction ``dF = einsum(g, Ky, Kx)`` which XLA
already handles well (boxes are non-differentiable here — proposals
are stop-gradient inputs, matching d2).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import _interp_matrix, _sample_coords

H_TILE = 8
BOX_BLOCK = 4
BWD_BOX_BLOCK = 2


def _kernel(f_ref, ky_ref, kx_ref, out_ref):
    """Grid: (B, N/BOX_BLOCK, H/H_TILE); H innermost.

    f_ref:  [1, H_TILE, W, C]         feature tile (VMEM)
    ky_ref: [1, BOX_BLOCK, H_TILE, P] interpolation rows for this tile
            (H on the sublane axis so H_TILE blocking is tile-legal)
    kx_ref: [1, BOX_BLOCK, P, W]
    out_ref:[1, BOX_BLOCK, P, P, C]   accumulated across the H grid axis
    """
    h_idx = pl.program_id(2)

    @pl.when(h_idx == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    f = f_ref[0]      # [H_TILE, W, C]
    ky = ky_ref[0]    # [N, H_TILE, P]
    kx = kx_ref[0]    # [N, P, W]
    # contract W FIRST so the intermediate is [N, Q, H_TILE, C] — an
    # order of magnitude smaller than the [N, P, W, C] alternative
    # (which blows the VMEM stack):
    #   s[n, q, h, c] = sum_w kx[n, q, w] * f[h, w, c]
    s = jax.lax.dot_general(
        kx, f,
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [N, Q, H_TILE, C]
    #   out[n, p, q, c] += sum_h ky[n, h, p] * s[n, q, h, c]
    contrib = jax.lax.dot_general(
        ky, s,
        dimension_numbers=(((1,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [N, P, Q, C]
    out_ref[...] += contrib[None]


def _pad_to(x, multiple, axis):
    rem = (-x.shape[axis]) % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad)


@functools.partial(jax.jit, static_argnames=("pooled", "sampling_ratio",
                                             "interpret"))
def _forward(features, boxes, spatial_scale, pooled, sampling_ratio,
             interpret=False):
    b, h, w, c = features.shape
    n = boxes.shape[1]
    sr = max(int(sampling_ratio), 1)
    x0 = boxes[..., 0] * spatial_scale - 0.5
    y0 = boxes[..., 1] * spatial_scale - 0.5
    bw = boxes[..., 2] * spatial_scale - 0.5 - x0
    bh = boxes[..., 3] * spatial_scale - 0.5 - y0
    flat = lambda v: v.reshape(b * n)
    ky = _interp_matrix(_sample_coords(flat(y0), flat(bh), pooled, sr),
                        h).reshape(b, n, pooled, h)
    kx = _interp_matrix(_sample_coords(flat(x0), flat(bw), pooled, sr),
                        w).reshape(b, n, pooled, w)

    fp = _pad_to(features.astype(jnp.float32), H_TILE, 1)
    hp = fp.shape[1]
    ky = _pad_to(ky, H_TILE, 3)
    ky = _pad_to(ky, BOX_BLOCK, 1)
    kx = _pad_to(kx, BOX_BLOCK, 1)
    np_ = ky.shape[1]
    ky_t = ky.swapaxes(2, 3)  # [B, N, H, P]: H on the sublane axis

    grid = (b, np_ // BOX_BLOCK, hp // H_TILE)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H_TILE, w, c),
                         lambda bi, ni, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, BOX_BLOCK, H_TILE, pooled),
                         lambda bi, ni, hi: (bi, ni, hi, 0)),
            pl.BlockSpec((1, BOX_BLOCK, pooled, w),
                         lambda bi, ni, hi: (bi, ni, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BOX_BLOCK, pooled, pooled, c),
                               lambda bi, ni, hi: (bi, ni, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, np_, pooled, pooled, c),
                                       jnp.float32),
        interpret=interpret,
    )(fp, ky_t, kx)
    return out[:, :n].astype(features.dtype), (ky[:, :n], kx[:, :n])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def roi_align_pallas(features, boxes, spatial_scale, pooled=14,
                     sampling_ratio=2, interpret=False):
    """Fused-TPU ROIAlign: features [B, H, W, C], boxes [B, N, 4] ->
    [B, N, pooled, pooled, C]."""
    out, _ = _forward(features, boxes, spatial_scale, pooled,
                      sampling_ratio, interpret)
    return out


def _fwd(features, boxes, spatial_scale, pooled, sampling_ratio,
         interpret):
    out, (ky, kx) = _forward(features, boxes, spatial_scale, pooled,
                             sampling_ratio, interpret)
    # zero-length prototype carries features' shape/dtype through the
    # residual pytree (plain shapes/dtypes are not valid JAX leaves)
    f_proto = jnp.zeros((0,) + features.shape[1:], features.dtype)
    return out, (ky, kx, f_proto)


def _bwd_kernel(g_ref, ky_ref, kx_ref, df_ref):
    """Backward: grid (B, H/H_TILE, N/BOX_BLOCK); N innermost so the
    dF tile accumulates in VMEM while g is streamed exactly once.

    g_ref:  [1, BOX_BLOCK, P, Q, C]
    ky_ref: [1, BOX_BLOCK, H_TILE, P]
    kx_ref: [1, BOX_BLOCK, Q, W]
    df_ref: [1, H_TILE, W, C]
    """
    n_idx = pl.program_id(2)

    @pl.when(n_idx == 0)
    def _():
        df_ref[...] = jnp.zeros_like(df_ref)

    g = g_ref[0]      # [N, P, Q, C]
    ky = ky_ref[0]    # [N, H_TILE, P]
    kx = kx_ref[0]    # [N, Q, W]
    # v[n, h, q, c] = sum_p ky[n, h, p] g[n, p, q, c]
    v = jax.lax.dot_general(
        ky, g, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [N, H_TILE, Q, C]
    # df[h, w, c] += sum_{n, q} v[n, h, q, c] kx[n, q, w]
    # accumulate box-by-box, statically unrolled (a batched
    # [N, H, C, W] intermediate blows the VMEM budget; BOX_BLOCK tiny
    # matmuls keep only one [H, C, W] tile live; Mosaic can't
    # dynamic-slice vectors, so the loop must unroll)
    contrib = jnp.zeros((v.shape[1], v.shape[3], kx.shape[2]),
                        jnp.float32)
    for i in range(v.shape[0]):
        contrib += jax.lax.dot_general(
            v[i], kx[i], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [H_TILE, C, W]
    df_ref[...] += contrib.swapaxes(1, 2)[None]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _backward_df(g, ky, kx, f_proto, interpret=False):
    """dF via the Pallas scatter-free backward kernel."""
    b, hdim, wdim, cdim = (f_proto.shape[0] or g.shape[0],
                           f_proto.shape[1], f_proto.shape[2],
                           f_proto.shape[3])
    b = g.shape[0]
    pooled = g.shape[2]
    g = _pad_to(g.astype(jnp.float32), BWD_BOX_BLOCK, 1)
    kyp = _pad_to(ky, BWD_BOX_BLOCK, 1)
    kxp = _pad_to(kx, BWD_BOX_BLOCK, 1)
    # zero padded boxes' contributions
    np_ = g.shape[1]
    hp = ((hdim + H_TILE - 1) // H_TILE) * H_TILE
    ky_t = _pad_to(kyp.swapaxes(2, 3), H_TILE, 2)  # [B, N, Hp, P]

    grid = (b, hp // H_TILE, np_ // BWD_BOX_BLOCK)
    df = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BWD_BOX_BLOCK, pooled, pooled, cdim),
                         lambda bi, hi, ni: (bi, ni, 0, 0, 0)),
            pl.BlockSpec((1, BWD_BOX_BLOCK, H_TILE, pooled),
                         lambda bi, hi, ni: (bi, ni, hi, 0)),
            pl.BlockSpec((1, BWD_BOX_BLOCK, pooled, wdim),
                         lambda bi, hi, ni: (bi, ni, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H_TILE, wdim, cdim),
                               lambda bi, hi, ni: (bi, hi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hp, wdim, cdim), jnp.float32),
        # the accumulator + double-buffered streams sit ~24KB above the
        # default 16M scoped budget; v5e VMEM is far larger
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
        interpret=interpret,
    )(g, ky_t, kxp)
    return df[:, :hdim].astype(f_proto.dtype)


def _bwd(spatial_scale, pooled, sampling_ratio, interpret, res, g):
    ky, kx, f_proto = res
    h = f_proto.shape[1]
    df = _backward_df(g, ky[..., :h], kx, f_proto, interpret)
    return df, jnp.zeros((ky.shape[0], ky.shape[1], 4), jnp.float32)


roi_align_pallas.defvjp(_fwd, _bwd)

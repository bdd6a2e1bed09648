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


FUSED_N_BLOCK = 16
FUSED_C_BLOCK = 128


def _fused_kernel(f_ref, ky_ref, kx_ref, out_ref):
    """Inference-oriented fused ROIAlign. Grid (B, C/Cb, N/Nb) with the
    BOX axis innermost: the feature slab's index map ignores the box
    index, so Mosaic keeps the [H, W, Cb] tile VMEM-resident across all
    box blocks (the original `_kernel` re-DMA'd its feature tile once
    per 4-box block — ~17 GB/step at STT eval shapes, the measured
    reason it lost to XLA). The [Nb, Q, H, Cb] intermediate lives only
    in VMEM — the XLA two-einsum form round-trips it through HBM
    (~11.5 GB/step at eval shapes, PERF.md), which is that path's
    dominant cost.

    f_ref:   [1, H, W, Cb]    feature slab (resident across box blocks)
    ky_ref:  [1, Nb, H, P]
    kx_ref:  [1, Nb, Q, W]
    out_ref: [1, Nb, P, Q, Cb] written once per grid cell
    """
    f = f_ref[0]
    ky = ky_ref[0]
    kx = kx_ref[0]
    # s[n, q, h, cb] = sum_w kx[n, q, w] f[h, w, cb]
    s = jax.lax.dot_general(
        kx, f, dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [Nb, Q, H, Cb]
    # out[n, p, q, cb] = sum_h ky[n, h, p] s[n, q, h, cb]
    out = jax.lax.dot_general(
        ky, s, dimension_numbers=(((1,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [Nb, P, Q, Cb]
    out_ref[...] = out[None].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("pooled", "sampling_ratio",
                                             "interpret"))
def roi_align_pallas_fused(features, boxes, spatial_scale, pooled=14,
                           sampling_ratio=2, interpret=False):
    """Fused single-pass ROIAlign forward (serving path; no VJP).
    features [B, H, W, C] -> [B, N, P, P, C] in features.dtype.
    ``sampling_ratio<=0`` uses the d2 adaptive grid (same semantics as
    ``roi_align_batched``)."""
    from .roi_align import _adaptive_coords
    b, h, w, c = features.shape
    n = boxes.shape[1]
    x0 = boxes[..., 0] * spatial_scale - 0.5
    y0 = boxes[..., 1] * spatial_scale - 0.5
    bw = boxes[..., 2] * spatial_scale - 0.5 - x0
    bh = boxes[..., 3] * spatial_scale - 0.5 - y0
    flat = lambda v: v.reshape(b * n)
    if sampling_ratio > 0:
        sr = int(sampling_ratio)
        ky = _interp_matrix(_sample_coords(flat(y0), flat(bh), pooled,
                                           sr), h)
        kx = _interp_matrix(_sample_coords(flat(x0), flat(bw), pooled,
                                           sr), w)
    else:
        cy, wy = _adaptive_coords(flat(y0), flat(bh), pooled)
        cx, wx = _adaptive_coords(flat(x0), flat(bw), pooled)
        ky = _interp_matrix(cy, h, wy)
        kx = _interp_matrix(cx, w, wx)
    ky = ky.reshape(b, n, pooled, h)
    kx = kx.reshape(b, n, pooled, w)

    io = features.dtype
    nb = FUSED_N_BLOCK
    cb = min(FUSED_C_BLOCK, c)
    fp = _pad_to(features, 8, 1)
    hp = fp.shape[1]
    # ky -> [B, N, H, P]: H on the sublane axis of the ky tile
    ky_t = _pad_to(_pad_to(ky.swapaxes(2, 3), 8, 2), nb, 1).astype(io)
    kx_p = _pad_to(kx, nb, 1).astype(io)
    np_ = ky_t.shape[1]

    grid = (b, c // cb, np_ // nb)
    out = pl.pallas_call(
        _fused_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hp, w, cb),
                         lambda bi, ci, ni: (bi, 0, 0, ci)),
            pl.BlockSpec((1, nb, hp, pooled),
                         lambda bi, ci, ni: (bi, ni, 0, 0)),
            pl.BlockSpec((1, nb, pooled, w),
                         lambda bi, ci, ni: (bi, ni, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, nb, pooled, pooled, cb),
                               lambda bi, ci, ni: (bi, ni, 0, 0, ci)),
        out_shape=jax.ShapeDtypeStruct((b, np_, pooled, pooled, c), io),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
        interpret=interpret,
    )(fp, ky_t, kx_p)
    return out[:, :n]


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


BWD_N_BLOCK = 8
BWD_C_BLOCK = 128


def _bwd_kernel(gt_ref, kyb_ref, kx_ref, df_ref):
    """Backward: grid (B, C/Cb, N/nb); N innermost so the FULL
    [H, Cb, W] dF tile accumulates in VMEM while the cotangent is
    streamed from HBM exactly once (the previous kernel re-read g once
    per H-tile and contracted 2 boxes at a time — 7x the traffic and
    K=28-wide matmuls). Here the accumulation matmul contracts the
    fused (n, p) axis, nb*P = 112-wide, on the MXU.

    gt_ref:  [1, nb, P, Cb, Q]  cotangent, C-major-of-Q layout
    kyb_ref: [1, H, nb, P]
    kx_ref:  [1, nb, Q, W]
    df_ref:  [1, H, Cb, W]      (transposed to [H, W, C] by the caller)
    """
    ni = pl.program_id(2)

    @pl.when(ni == 0)
    def _():
        df_ref[...] = jnp.zeros_like(df_ref)

    gt = gt_ref[0]    # [nb, P, Cb, Q]
    kyb = kyb_ref[0]  # [H, nb*P]  ((n, p) pre-merged in XLA)
    kx = kx_ref[0]    # [nb, Q, W]
    nb, p, cb, q = gt.shape
    w = kx.shape[2]
    # u[n, (p c), w] = sum_q gt[n, (p c), q] kx[n, q, w]
    u = jax.lax.dot_general(
        gt.reshape(nb, p * cb, q), kx,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [nb, P*Cb, Wp]
    # df[h, cb, w] += sum_{(n p)} kyb[h, (n p)] u[(n p), cb, w]
    # (major-dim reshapes only; Mosaic's matmul takes one contracting
    # dim + multi free dims on the rhs when the minor dim is 128 —
    # hence W padded to 128 by the caller)
    u = u.reshape(nb, p, cb, w).reshape(nb * p, cb, w)
    contrib = jax.lax.dot_general(
        kyb.astype(u.dtype), u,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [H, Cb, Wp]
    df_ref[...] += contrib[None]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _backward_df(g, ky, kx, f_proto, interpret=False):
    """dF via the Pallas scatter-free backward kernel."""
    hdim, wdim, cdim = (f_proto.shape[1], f_proto.shape[2],
                        f_proto.shape[3])
    b = g.shape[0]
    pooled = g.shape[2]
    io_dtype = jnp.bfloat16 if f_proto.dtype == jnp.bfloat16 \
        else jnp.float32
    cb = min(BWD_C_BLOCK, cdim)
    # the fused (n, p) contraction axis must block to a multiple of
    # 128 lanes: pad P to 16 so nb * p2 = 128 exactly (zero rows of
    # ky/g contribute nothing)
    p2 = ((pooled + 15) // 16) * 16
    wp = ((wdim + 127) // 128) * 128  # W on lanes: pad to 128
    g = _pad_to(_pad_to(g.astype(io_dtype), BWD_N_BLOCK, 1), p2, 2)
    kyp = _pad_to(_pad_to(ky, BWD_N_BLOCK, 1), p2, 2).astype(io_dtype)
    kxp = _pad_to(_pad_to(kx, BWD_N_BLOCK, 1), wp, 3).astype(io_dtype)
    np_ = g.shape[1]
    hp = ((hdim + 7) // 8) * 8
    # one-time XLA relayouts: cotangent [B,N,P,Q,C] -> [B,N,P,C,Q] so
    # the kernel's q-contraction is over the minor axis, and ky ->
    # [B, H, N*P2] so the fused (n, p) contraction needs no in-kernel
    # relayout
    gt = jnp.swapaxes(g, 3, 4)
    kyb = _pad_to(jnp.transpose(kyp, (0, 3, 1, 2)), hp, 1)
    kyb = kyb.reshape(b, kyb.shape[1], np_ * p2)

    grid = (b, cdim // cb, np_ // BWD_N_BLOCK)
    df = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BWD_N_BLOCK, p2, cb, pooled),
                         lambda bi, ci, ni: (bi, ni, 0, ci, 0)),
            pl.BlockSpec((1, hp, BWD_N_BLOCK * p2),
                         lambda bi, ci, ni: (bi, 0, ni)),
            pl.BlockSpec((1, BWD_N_BLOCK, pooled, wp),
                         lambda bi, ci, ni: (bi, ni, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hp, cb, wp),
                               lambda bi, ci, ni: (bi, 0, ci, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hp, cdim, wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
        interpret=interpret,
    )(gt, kyb, kxp)
    # [B, H, C, Wp] -> [B, H, W, C]
    return jnp.swapaxes(df[:, :hdim, :, :wdim], 2, 3).astype(
        f_proto.dtype)


def _bwd(spatial_scale, pooled, sampling_ratio, interpret, res, g):
    ky, kx, f_proto = res
    h = f_proto.shape[1]
    df = _backward_df(g, ky[..., :h], kx, f_proto, interpret)
    return df, jnp.zeros((ky.shape[0], ky.shape[1], 4), jnp.float32)


roi_align_pallas.defvjp(_fwd, _bwd)

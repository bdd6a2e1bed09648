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


def _interp_matrix(coords: jnp.ndarray, dim: int,
                   sample_weights: jnp.ndarray = None) -> jnp.ndarray:
    """Averaged bilinear hat weights for sample coordinates.

    coords: [N, P, S] continuous sample positions along one axis.
    Returns [N, P, dim] weights averaged over the S samples per bin;
    with ``sample_weights`` [N, P, S] given, samples are combined by
    weighted sum instead (per-box sample counts for adaptive sampling).
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
    if sample_weights is None:
        return w.mean(axis=2)  # average over sampling points
    return (w * sample_weights[..., None]).sum(axis=2)


def _sample_coords(lo: jnp.ndarray, size: jnp.ndarray, pooled: int,
                   ratio: int) -> jnp.ndarray:
    """Continuous sample positions: for bin p and sample s,
    lo + (p + (s + 0.5)/ratio) * bin_size. lo/size: [N]."""
    bin_size = size / pooled  # [N]
    p = jnp.arange(pooled, dtype=lo.dtype)[None, :, None]
    s = (jnp.arange(ratio, dtype=lo.dtype)[None, None, :] + 0.5) / ratio
    return lo[:, None, None] + (p + s) * bin_size[:, None, None]


# Static cap on the adaptive per-bin sampling grid. d2's adaptive mode
# uses ceil(roi_size/pooled) samples per bin; at stride 16 / pooled 14
# the cap of 8 is exact for any ROI up to 8*14*16 = 1792 image pixels
# per side — beyond every shipped INPUT.MAX_SIZE. Boxes larger than
# that are sampled at the cap (still denser than any fixed ratio).
ADAPTIVE_SR_MAX = 8


def _adaptive_coords(lo: jnp.ndarray, size: jnp.ndarray, pooled: int,
                     sr_max: int = ADAPTIVE_SR_MAX):
    """d2 adaptive sampling (POOLER_SAMPLING_RATIO=0,
    reference consumption site roi_emb_heads.py:176-187 -> d2 ROIAlign):
    per-box per-axis grid of ceil(roi_size/pooled) samples, here as a
    static [N, P, sr_max] slot array with zero weight on unused slots.
    Degenerate (size<=0) boxes get an empty grid -> all-zero weights ->
    zero output, matching the CUDA kernel's empty loop + max(count,1).

    Returns (coords [N, P, S], sample_weights [N, P, S])."""
    dt = lo.dtype
    bin_size = size / pooled                         # [N]
    sr = jnp.clip(jnp.ceil(bin_size), 0.0, float(sr_max))  # [N]
    srn = jnp.maximum(sr, 1.0)[:, None]              # [N, 1]
    s_idx = jnp.arange(sr_max, dtype=dt)[None, :]    # [1, S]
    pos = (s_idx + 0.5) / srn                        # [N, S] in-bin frac
    p = jnp.arange(pooled, dtype=dt)[None, :, None]  # [1, P, 1]
    coords = lo[:, None, None] + \
        (p + pos[:, None, :]) * bin_size[:, None, None]
    weight = jnp.where(s_idx < sr[:, None], 1.0 / srn, 0.0)  # [N, S]
    weight = jnp.broadcast_to(weight[:, None, :], coords.shape)
    return coords, weight


def roi_align_batched(features: jnp.ndarray, boxes: jnp.ndarray,
                      spatial_scale: float, pooled: int = 14,
                      sampling_ratio: int = 2, chunk: int = 200,
                      precision: str = "highest") -> jnp.ndarray:
    """Batched ROIAlign: features [B, H, W, C], boxes [B, N, 4] ->
    [B, N, pooled, pooled, C]. Custom VJP: XLA's transpose of the
    chunked forward scan costs ~7x the whole forward on TPU; the
    hand-written backward is a chunked accumulation of Ky^T @ g @ Kx.
    Boxes are non-differentiable (proposals are stop-gradient inputs,
    matching d2)."""
    # Clamp the chunk so small-N call sites (single-image wrapper,
    # precomputed-proposal paths with N << default) don't pad N up to
    # the large-N tuning and pay ~chunk/N x the einsum FLOPs/HBM.
    n = boxes.shape[1]
    chunk = max(min(chunk, -(-n // 8) * 8), 1)
    return _roi_align_core(features, boxes, spatial_scale, pooled,
                           sampling_ratio, chunk, precision)


def roi_align_batched_quant(features: jnp.ndarray, boxes: jnp.ndarray,
                            spatial_scale: float, amax: jnp.ndarray,
                            pooled: int = 14, sampling_ratio: int = 2,
                            chunk: int = 200,
                            precision: str = "highest"):
    """Inference-only ROIAlign emitting int8 directly (static-int8
    serving, TPU.INT8_SCHEME='static'): the calibrated ``amax`` of the
    pooled tensor turns the quantize into a fused chunk epilogue.
    Returns (q [B, N, P, P, C] int8, scale f32 scalar) — exactly
    ``quantize_per_tensor_static(roi_align_batched(...), amax)`` with
    one HBM write instead of three passes. No VJP (serving never
    differentiates); training paths keep ``roi_align_batched``."""
    n = boxes.shape[1]
    chunk = max(min(chunk, -(-n // 8) * 8), 1)
    q, _ = _roi_align_impl(features, boxes, spatial_scale, pooled,
                           sampling_ratio, chunk, precision,
                           quant_amax=amax)
    scale = jnp.maximum(amax.astype(jnp.float32) / 127.0, 1e-12)
    return q, scale


def _build_kernels(boxes: jnp.ndarray, spatial_scale: float, h: int,
                   w: int, pooled: int, sampling_ratio: int):
    """Per-box 1-D interpolation matrices ky [B,N,P,H], kx [B,N,P,W]
    (f32) — the single source of truth for the box->matrix math
    (aligned=True / ROIAlignV2 half-pixel offset, fixed or d2-adaptive
    sampling), shared by the float and int8 forward paths."""
    b, n = boxes.shape[:2]
    # aligned=True (ROIAlignV2): half-pixel correction, no size clamping
    x0 = boxes[..., 0] * spatial_scale - 0.5
    y0 = boxes[..., 1] * spatial_scale - 0.5
    bw = boxes[..., 2] * spatial_scale - 0.5 - x0
    bh = boxes[..., 3] * spatial_scale - 0.5 - y0
    flat = lambda v: v.reshape(b * n)
    if sampling_ratio > 0:
        sr = int(sampling_ratio)
        ky = _interp_matrix(
            _sample_coords(flat(y0), flat(bh), pooled, sr),
            h).reshape(b, n, pooled, h)
        kx = _interp_matrix(
            _sample_coords(flat(x0), flat(bw), pooled, sr),
            w).reshape(b, n, pooled, w)
    else:
        cy, wy = _adaptive_coords(flat(y0), flat(bh), pooled)
        cx, wx = _adaptive_coords(flat(x0), flat(bw), pooled)
        ky = _interp_matrix(cy, h, wy).reshape(b, n, pooled, h)
        kx = _interp_matrix(cx, w, wx).reshape(b, n, pooled, w)
    return ky, kx


def _quantize_rows(k: jnp.ndarray):
    """Symmetric per-ROW int8 quantization of an interpolation matrix
    [B, N, P, dim] (rows are tiny — max entry ~2/sr for adaptive
    sampling — so per-row scales keep the weight resolution ~8x finer
    than a per-tensor scale would). Returns (q int8, scale [B,N,P])."""
    rmax = jnp.max(jnp.abs(k), axis=-1)
    scale = jnp.maximum(rmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(k / scale[..., None]), -127.0, 127.0)
    return q.astype(jnp.int8), scale


def roi_align_batched_int8(features: jnp.ndarray, boxes: jnp.ndarray,
                           spatial_scale: float, amax_in: jnp.ndarray,
                           amax_pool: jnp.ndarray, pooled: int = 14,
                           sampling_ratio: int = 0, chunk: int = 200):
    """Inference-only full-int8 ROIAlign (static-int8 serving).

    Both separable contractions run int8 x int8 -> int32 on the MXU
    (2x bf16 rate) and — the actual win — the [B, chunk, Q, H, C]
    chunk intermediate is written to HBM as int8 instead of bf16,
    halving the traffic of this HBM-bound op (measured ~11.5 GB/step
    round-trip on the STT int8 eval profile, PERF.md).

    Scale algebra: features are quantized per-tensor by the calibrated
    ``amax_in`` (s_f = amax_in/127); interpolation matrices per-row
    (weights >= 0, rows sum to <= 1, so every partial interpolation is
    a convex combination bounded by max|f| — the intermediate
    requantizes to scale s_f with NO extra calibrated statistic:
    t_q = round(t_i32 * s_kx_row), exact up to int8 resolution).
    The second contraction's epilogue rescales straight to the pooled
    tensor's calibrated scale (same ``amax_pool`` the bf16 path uses).

    Returns (q [B, N, P, P, C] int8, scale f32 scalar) — a drop-in for
    ``roi_align_batched_quant`` with int8-resolution interpolation.
    No VJP (serving never differentiates)."""
    b, h, w, c = features.shape
    n = boxes.shape[1]
    chunk = max(min(chunk, -(-n // 8) * 8), 1)

    ky, kx = _build_kernels(boxes.astype(jnp.float32), spatial_scale,
                            h, w, pooled, sampling_ratio)
    kyq, sy = _quantize_rows(ky)
    kxq, sx = _quantize_rows(kx)

    s_f = jnp.maximum(amax_in.astype(jnp.float32) / 127.0, 1e-12)
    s_pool = jnp.maximum(amax_pool.astype(jnp.float32) / 127.0, 1e-12)
    fq = jnp.clip(jnp.round(features.astype(jnp.float32) / s_f),
                  -127.0, 127.0).astype(jnp.int8)

    pad = (-n) % chunk
    if pad:
        zp = ((0, 0), (0, pad), (0, 0), (0, 0))
        kyq, kxq = jnp.pad(kyq, zp), jnp.pad(kxq, zp)
        sy = jnp.pad(sy, zp[:3])
        sx = jnp.pad(sx, zp[:3])
    nchunks = (n + pad) // chunk
    ck = lambda k, d: jnp.moveaxis(
        k.reshape(b, nchunks, chunk, pooled, d), 1, 0)
    kyq, kxq = ck(kyq, h), ck(kxq, w)
    cs = lambda s: jnp.moveaxis(
        s.reshape(b, nchunks, chunk, pooled), 1, 0)
    sy, sx = cs(sy), cs(sx)

    def do_chunk(i):
        # t_i32[b,n,q,h,c] = sum_w kxq[b,n,q,w] fq[b,h,w,c]
        t = jnp.einsum("bnqw,bhwc->bnqhc", kxq[i], fq,
                       preferred_element_type=jnp.int32)
        # requantize to scale s_f (epilogue fuses: convert+mul+round)
        tq = jnp.clip(jnp.round(t.astype(jnp.float32) *
                                sx[i][..., None, None]),
                      -127.0, 127.0).astype(jnp.int8)
        r = jnp.einsum("bnqhc,bnph->bnpqc", tq, kyq[i],
                       preferred_element_type=jnp.int32)
        # r_float = r * s_f * sy_row; emit at the pooled scale
        rescale = (s_f / s_pool) * sy[i]  # [B, chunk, P]
        out = jnp.clip(jnp.round(r.astype(jnp.float32) *
                                 rescale[..., None, None]),
                       -127.0, 127.0).astype(jnp.int8)
        return out

    if nchunks == 1:
        out = do_chunk(0)
    elif nchunks <= 8:
        out = jnp.concatenate([do_chunk(i) for i in range(nchunks)],
                              axis=1)
    else:
        out = jnp.moveaxis(
            jax.lax.map(do_chunk, jnp.arange(nchunks)), 0, 1)
        out = out.reshape(b, nchunks * chunk, pooled, pooled, c)
    return out[:, :n], s_pool


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _roi_align_core(features, boxes, spatial_scale, pooled,
                    sampling_ratio, chunk, precision):
    out, _ = _roi_align_impl(features, boxes, spatial_scale, pooled,
                             sampling_ratio, chunk, precision)
    return out


@partial(jax.jit, static_argnames=("pooled", "sampling_ratio", "chunk",
                                   "precision"))
def _roi_align_impl(features: jnp.ndarray, boxes: jnp.ndarray,
                    spatial_scale: float, pooled: int = 14,
                    sampling_ratio: int = 2, chunk: int = 200,
                    precision: str = "highest", quant_amax=None):
    """features [B, H, W, C], boxes [B, N, 4] ->
    ([B, N, pooled, pooled, C], (ky, kx)).

    The batch is a native leading dim of the chunked einsums (a
    lax.map under vmap is an XLA compile-time hazard on TPU); boxes are
    processed in chunks of ``chunk`` to bound the [B, chunk, P, W, C]
    intermediate."""
    b, h, w = features.shape[0], features.shape[1], features.shape[2]
    n = boxes.shape[1]
    ky, kx = _build_kernels(boxes, spatial_scale, h, w, pooled,
                            sampling_ratio)

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
    # ~6x faster — appropriate when the features are bf16 anyway. The
    # interpolation matrices must be cast DOWN to the feature dtype:
    # f32 x bf16 einsums promote to f32 and put the whole op on the
    # 8x-slower f32 MXU path (measured 45 ms/step -> ~8 ms).
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    if precision != "highest":
        ky = ky.astype(features.dtype)
        kx = kx.astype(features.dtype)

    # this pass is HBM-bound: in fast ("default") mode, store the
    # [B, n, Q, H, C] intermediate and the pooled output in bf16 (the
    # MXU still accumulates each contraction in f32 internally; only
    # the materialized buffers shrink). Measured on the STT eval
    # workload (8 x 1000 boxes): f32 buffers cost ~2x the HBM traffic
    # of the whole op.
    io_dtype = jnp.float32 if precision == "highest" else features.dtype

    def do_chunk(k):
        ky_c, kx_c = k  # [B, chunk, P, dim]
        # contract W FIRST: the [B, n, Q, H, C] intermediate is H/W
        # (~40% on landscape buckets) smaller than the W-second form's
        # [B, n, P, W, C], and stage 2 contracts the longer axis
        t = jnp.einsum("bnqw,bhwc->bnqhc", kx_c, features,
                       preferred_element_type=io_dtype,
                       precision=prec)
        res = jnp.einsum("bnqhc,bnph->bnpqc", t, ky_c,
                         preferred_element_type=io_dtype,
                         precision=prec).astype(features.dtype)
        if quant_amax is not None:
            # static-int8 serving: quantize INSIDE the chunk so XLA
            # fuses the round/clip/cast into the einsum epilogue and
            # the pooled tensor is written once, as s8 — the separate
            # whole-tensor quantize pass could not fuse through the
            # chunk concatenate (measured 11.7 ms on the STT eval
            # profile). Math matches quantize_per_tensor_static.
            scale = jnp.maximum(
                quant_amax.astype(jnp.float32) / 127.0, 1e-12)
            res = jnp.clip(jnp.round(res.astype(jnp.float32) / scale),
                           -127.0, 127.0).astype(jnp.int8)
        return res

    if nchunks == 1:
        out = do_chunk((ky[0], kx[0]))
    elif nchunks <= 8:
        # unrolled with a box-axis concatenate: lax.map stacks every
        # chunk's [B, n, P, Q, C] output into a [nchunks, ...] carry
        # via dynamic-update-slice and the subsequent moveaxis is a
        # full transposed copy of the pooled tensor (~20% of the op on
        # the 5-chunk eval workload); concatenating along the box axis
        # writes each chunk straight into its final position
        out = jnp.concatenate([do_chunk((ky[i], kx[i]))
                               for i in range(nchunks)], axis=1)
    else:
        out = jnp.moveaxis(jax.lax.map(do_chunk, (ky, kx)), 0, 1)
        out = out.reshape(b, nchunks * chunk, pooled, pooled,
                          features.shape[3])
    # ky/kx kept as [nchunks, B, chunk, P, dim] for the backward
    # (dtype cast already applied per chunk)
    return out[:, :n], (ky, kx)


def _roi_align_fwd(features, boxes, spatial_scale, pooled,
                   sampling_ratio, chunk, precision):
    out, (ky, kx) = _roi_align_impl(features, boxes, spatial_scale,
                                    pooled, sampling_ratio, chunk,
                                    precision)
    f_proto = jnp.zeros((0,) + features.shape[1:], features.dtype)
    return out, (ky, kx, f_proto, boxes.shape[1])


def _roi_align_bwd(spatial_scale, pooled, sampling_ratio, chunk,
                   precision, res, g):
    """dF[b,h,w,c] = sum_n Ky[b,n]^T @ g[b,n] @ Kx[b,n], accumulated in
    a scan over box chunks so no [*, P, W, C]-sized cotangent ever
    spans more than one chunk."""
    ky, kx, f_proto, n = res
    nchunks = ky.shape[0]
    b = ky.shape[1]
    hdim, wdim, cdim = f_proto.shape[1], f_proto.shape[2], \
        f_proto.shape[3]
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)

    # contract the SMALL pooled axis first so the [B, bk, H, Q, C]
    # intermediate carries (H, Q) rather than (P, W); keep the chunk
    # size — re-chunking finer multiplies the f32 dF-accumulator
    # read+write (34 MB/iter at LSM shapes) and the while-loop
    # overhead by the iteration count (measured: bk=8 cost 2.5x bk=32)
    bk = chunk
    total = nchunks * chunk
    # in fast ("default") mode, stream cotangents/intermediates in bf16
    # (the accumulator stays f32) — halves the HBM traffic that
    # dominates this memory-bound pass
    io_dtype = jnp.float32 if precision == "highest" else jnp.bfloat16
    kyf = jnp.moveaxis(ky, 0, 1).reshape(b, total, pooled, hdim)
    kxf = jnp.moveaxis(kx, 0, 1).reshape(b, total, pooled, wdim)
    nck = total // bk
    kyc = jnp.moveaxis(kyf.reshape(b, nck, bk, pooled, hdim),
                       1, 0).astype(io_dtype)
    kxc = jnp.moveaxis(kxf.reshape(b, nck, bk, pooled, wdim),
                       1, 0).astype(io_dtype)
    gpad = jnp.pad(g.astype(io_dtype),
                   ((0, 0), (0, total - n), (0, 0), (0, 0), (0, 0)))
    gc = jnp.moveaxis(
        gpad.reshape(b, nck, bk, pooled, pooled, cdim), 1, 0)

    def one_chunk(ky_c, kx_c, g_c):
        # [B, bk, P, dim] / [B, bk, P, Q, C]
        # v[b,n,h,q,c] = sum_p ky[b,n,p,h] g[b,n,p,q,c]
        v = jnp.einsum("bnph,bnpqc->bnhqc", ky_c, g_c, precision=prec,
                       preferred_element_type=io_dtype)
        # df[b,h,w,c] += sum_{n,q} v[b,n,h,q,c] kx[b,n,q,w]
        return jnp.einsum("bnhqc,bnqw->bhwc", v, kx_c, precision=prec,
                          preferred_element_type=jnp.float32)

    if nck == 1:
        # single chunk: no accumulator round-trips, no loop
        df = one_chunk(kyc[0], kxc[0], gc[0])
    else:
        def body(carry, inp):
            return carry + one_chunk(*inp), None

        zero = jnp.zeros((b, hdim, wdim, cdim), jnp.float32)
        df, _ = jax.lax.scan(body, zero, (kyc, kxc, gc))
    return df.astype(f_proto.dtype), jnp.zeros((b, n, 4), jnp.float32)


_roi_align_core.defvjp(_roi_align_fwd, _roi_align_bwd)


def roi_align(features: jnp.ndarray, boxes: jnp.ndarray,
              spatial_scale: float, pooled: int = 14,
              sampling_ratio: int = 2, chunk: int = 200) -> jnp.ndarray:
    """Single-image wrapper: [H, W, C], [N, 4] -> [N, P, P, C]."""
    return roi_align_batched(features[None], boxes[None], spatial_scale,
                             pooled, sampling_ratio, chunk)[0]

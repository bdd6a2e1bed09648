"""Pallas patch-matmul stem conv (7x7/stride-2/pad-3, 3 channels).

STATUS: MEASURED DEAD END #6 — kept, with its tests, as evidence; the
production stem stays on the XLA conv (models/resnet.py). This was the
last untried angle on the stem cluster (round-3 review Next #2). The
full on-chip accounting at LSM shapes ([4, 800, 1344, 3] bf16):

  - XLA baseline (conv + shift, standalone):            6.66 ms
    (in-step: 4.16 ms conv + ~1.6 ms pad/layout copies)
  - This kernel, lane-ALIGNED q=768 blocks, per-row dots,
    CW out:                                  3.16 ms  <- beats XLA...
  - ...but its mandatory inputs/outputs don't compose:
      St4 repack in XLA:      15.7 ms standalone, ~3.1 ms fused
                              (both the s2d-transpose and the
                              48-strided-slice formulations)
      CW -> NHWC for the pool: 13.3 ms XLA transpose; in-kernel
                              jnp.transpose works in Mosaic but runs
                              ~2.4 us per [768, 16] tile (13+ ms at
                              stem scale); NHWC stores from the
                              kernel cost +7 ms (64-lane half-tile
                              masking)
  - best composable total: ~6.8 ms > 5.8 ms XLA in-step. LOSES.

  Secondary findings (general, recorded in ROADMAP):
  - lane-misaligned blocks (q=672) tax ALL DMA ~2.6x: the same
    copy-only kernel runs 8.0 ms at q=672 vs 3.1 ms at q=768;
    every dot-variant kernel was DMA-bound at ~9.5 ms regardless of
    body (1 big dot == 8 medium dots == 32 small dots).
  - standalone XLA repack microbenches are PESSIMISTIC: the pool
    pre-pack reshape ([672,64]->[336,128]) measures 8.7 ms alone but
    0.47 ms fused in the production step; layout assignment matters
    more than op identity.

The design itself (what the MXU can do for a 3-channel conv), kept
because the kernel DOES outrun XLA's conv when fed: it replaces the
reference's cuDNN stem conv (d2 ``BasicStem``, reference call path
``distill_prop_mmss_gcnn.py:105``), which runs at ~3% MXU efficiency —
3 input channels occupy 3/128 lanes of every MXU pass no matter how
XLA tiles it.

The factorization (same identity as ops/stem_conv.py's wgrad):

    7x7/s2 conv on 3 channels  ==  4x4/s1 conv on the 2x2
    space-to-depth repack (12 channels, kernel zero-padded to 8x8)

so each conv output row r becomes ONE [Q, 64] = [256, Q]^T @ [256, 64]
MXU matmul with a dense 256-deep contraction (4 dy-taps x 4 dx-taps x
16 channel slots, 12 real + 4 zero-padded), Q = W/2 output columns in
lanes.

Layout strategy — the five prior stem attempts (ROADMAP.md) died on
Mosaic's lane-granularity wall: any formulation that shifts or repacks
the 128-lane dimension in-kernel (dx-offset column reads, channel
interleaves) hits unsupported relayouts, and XLA's
``conv_general_dilated_patches`` materialization of the same patches is
pathological on TPU. This kernel moves ALL lane-misaligned work into
one XLA gather-free repack done once per step outside the kernel: the
``St4`` tensor

    St4[n, k, 16*dx + slot, q] = s2d[n, k, q + dx, slot]   [N, K, 64, Q]

holds the four dx-shifted copies of the (zero-padded-to-16) s2d
channels stacked in SUBLANES. In-kernel, assembling the [256, Q] patch
for output row r is then exactly four sublane-aligned [64, Q] slab
copies (St4 rows r..r+3) — no lane ops at all — followed by one
``dot_general`` contracting the sublane dimension. The row loop is
unrolled (RB rows per grid step) so halo-row source selection stays
static.

Cost at LSM shapes ([4, 800, 1344, 3] -> [4, 400, 672, 64]): matmul
27.5 GFLOP at K=256/M=64-padded tiles, St4 HBM traffic ~144 MB
write + ~1.4x read. Numerics: identical contraction set to the direct
conv, f32 accumulation (the MXU's internal conv accumulation does the
same); golden-tested against ``lax.conv_general_dilated`` in
tests/test_pallas_stem.py.

Backward: untouched — the public entry ``stem_conv_bn`` carries a
``custom_vjp`` whose bwd re-derives dx/dW from the PLAIN conv
formulation via ``jax.vjp`` (XLA's transposed-conv dx and wgrad, the
measured-best backward; every custom stem wgrad is a recorded dead
end, PERF.md rounds 2-4).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Output rows computed per grid step (unrolled in-kernel). Image
# buckets are /32-divisible -> H/2 rows divisible by 16, so 8 always
# divides the row count.
RB = 8

_DN = ("NHWC", "HWIO", "NHWC")


def _conv_ref(x, w):
    """The plain XLA formulation (forward reference + VJP source)."""
    return lax.conv_general_dilated(
        x, w, (2, 2), [(3, 3), (3, 3)], dimension_numbers=_DN)


def build_st4(x: jnp.ndarray) -> jnp.ndarray:
    """x [N, H, W, 3] (H, W even) -> St4 [N, H/2 + 3, 64, W/2] bf16.

    Sublane index s = 16*dx + (6*ry + 3*rx + c): the (ry, rx) input
    -pixel parity and channel c of the 2x2 space-to-depth repack of the
    pad-3 input, pre-shifted by dx columns. Measured 15.7 ms standalone
    / ~3.1 ms fused at LSM shapes in BOTH formulations tried (see
    module docstring) — the lane-granular repack is the wall.
    """
    n, h, w, c = x.shape
    assert c == 3 and h % 2 == 0 and w % 2 == 0, x.shape
    k, q = h // 2 + 3, w // 2
    xb = x.astype(jnp.bfloat16)
    xp = jnp.pad(xb, ((0, 0), (3, 3), (3, 3), (0, 0)))
    # One strided slice per sublane slot, stacked: every slice keeps
    # the LARGE q dimension minor, so XLA lowers the whole build as one
    # big-minor loop fusion. (The first formulation — s2d reshape +
    # fine-minor transposes — measured 15 ms standalone / ~3 ms fused:
    # XLA's TPU transpose of a 12-wide minor is pathological.)
    zero = jnp.zeros((n, k, q), jnp.bfloat16)
    slots = []
    for dx in range(4):
        for ry in range(2):
            for rx in range(2):
                for ci in range(3):
                    kx = 2 * dx + rx
                    sl = lax.slice(
                        xp, (0, ry, kx, ci),
                        (n, ry + 2 * (k - 1) + 1,
                         kx + 2 * (q - 1) + 1, ci + 1),
                        (1, 2, 2, 1))
                    slots.append(sl.reshape(n, k, q))
        slots.extend([zero] * 4)  # slot padding 12 -> 16
    return jnp.stack(slots, axis=2)


def build_w2(w: jnp.ndarray) -> jnp.ndarray:
    """w [7, 7, 3, F] (HWIO, BN pre-folded) -> W2 [256, F] bf16 in St4
    patch order: row 64*dy + 16*dx + (6*ry + 3*rx + c) holds
    w[2*dy + ry, 2*dx + rx, c] (entries with ky == 7 or kx == 7 are
    the zero padding of the 8x8 extension)."""
    f = w.shape[-1]
    w8 = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    t = w8.reshape(4, 2, 4, 2, 3, f).transpose(0, 2, 1, 3, 4, 5)
    t = jnp.pad(t.reshape(4, 4, 12, f), ((0, 0), (0, 0), (0, 4), (0, 0)))
    return t.reshape(256, f).astype(jnp.bfloat16)


def _dot(a, b, dims, f32):
    """dot_general wrapper: in interpret mode (CPU tests) the XLA:CPU
    DotThunk lacks bf16 x bf16 = f32, so cast operands to f32 there
    (value-exact for bf16 inputs)."""
    if f32:
        a, b = a.astype(jnp.float32), b.astype(jnp.float32)
    return lax.dot_general(a, b, (dims, ((), ())),
                           preferred_element_type=jnp.float32)


def _make_kernel_nhwc(f32dot):
    """v1: patch assembly + dim0-contraction dot -> NHWC rows."""
    def kernel(main, h0, h1, h2, w2, shift, out_ref, patch):
        halos = (h0, h1, h2)

        def src(t):  # St4 row r + dy within this step's window
            return main[0, t] if t < RB else halos[t - RB][0, 0]

        for r in range(RB):
            for dy in range(4):
                patch[64 * dy:64 * (dy + 1), :] = src(r + dy)
            acc = _dot(patch[:], w2[:], ((0,), (0,)), f32dot)
            out_ref[0, r] = (acc + shift[:]).astype(out_ref.dtype)
    return kernel


def _make_kernel_cw(f32dot):
    """v2: patch assembly + standard dot (W2^T @ patch) -> CW rows."""
    def kernel(main, h0, h1, h2, w2t, shift, out_ref, patch):
        halos = (h0, h1, h2)

        def src(t):
            return main[0, t] if t < RB else halos[t - RB][0, 0]

        for r in range(RB):
            for dy in range(4):
                patch[64 * dy:64 * (dy + 1), :] = src(r + dy)
            acc = _dot(w2t[:], patch[:], ((1,), (0,)), f32dot)
            out_ref[0, r] = (acc + shift[:]).astype(out_ref.dtype)
    return kernel


def _make_kernel_cw4(f32dot):
    """v3: four K=64 accumulating dots per row — no copies, no
    transposes: out[r] = sum_dy W2t[:, 64dy:64dy+64] @ St4[r+dy]."""
    def kernel(main, h0, h1, h2, w2t, shift, out_ref):
        halos = (h0, h1, h2)

        def src(t):
            return main[0, t] if t < RB else halos[t - RB][0, 0]

        for r in range(RB):
            acc = shift[:].astype(jnp.float32)
            for dy in range(4):
                acc = acc + _dot(w2t[:, 64 * dy:64 * (dy + 1)],
                                 src(r + dy), ((1,), (0,)), f32dot)
            out_ref[0, r] = acc.astype(out_ref.dtype)
    return kernel


def _make_kernel_bigdot(q, qp, f32dot):
    """v4 ("bigdot"): ONE MXU contraction per grid step. The per-row
    dot variants above all measured ~9.5 ms at LSM shapes regardless of
    form — 8-32 small dots per step are MXU-pipeline-latency-bound, not
    throughput-bound. Here the RB row-patches are packed side by side
    in lanes (each padded q -> qp, a 128 multiple, so every slab write
    stays lane-aligned; the pad lanes carry stale garbage that only
    feeds pad columns of the dot, sliced away on store) and contracted
    in a single [256, RB*qp] x [256, F] dot, then stored row-wise as
    NHWC sublane slices."""
    def kernel(main, h0, h1, h2, w2, shift, out_ref, patch):
        halos = (h0, h1, h2)

        def src(t):
            return main[0, t] if t < RB else halos[t - RB][0, 0]

        for r in range(RB):
            for dy in range(4):
                patch[64 * dy:64 * (dy + 1),
                      qp * r:qp * r + q] = src(r + dy)
        acc = _dot(patch[:], w2[:], ((0,), (0,)), f32dot) + shift[:]
        for r in range(RB):
            out_ref[0, r] = acc[qp * r:qp * r + q].astype(out_ref.dtype)
    return kernel


_KERNELS = {"nhwc": _make_kernel_nhwc, "cw": _make_kernel_cw,
            "cw4": _make_kernel_cw4}


@functools.partial(jax.jit, static_argnames=("variant", "interpret"))
def _fwd_impl(st4, w2, shift, variant="bigdot", interpret=False):
    n, k, _, q = st4.shape
    r_total = k - 3
    f = w2.shape[-1]
    assert r_total % RB == 0, (r_total, RB)
    grid = (n, r_total // RB)
    main = pl.BlockSpec((1, RB, 64, q), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    halos = [pl.BlockSpec((1, 1, 64, q),
                          lambda i, j, t=t: (i, j * RB + RB + t, 0, 0),
                          memory_space=pltpu.VMEM)
             for t in range(3)]
    nhwc = variant in ("nhwc", "bigdot")
    w2_spec = pl.BlockSpec((256, f) if nhwc else (f, 256),
                           lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    sh_spec = pl.BlockSpec((1, f) if nhwc else (f, 1),
                           lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    qp = -(-q // 128) * 128
    if variant == "bigdot":
        kernel = _make_kernel_bigdot(q, qp, interpret)
        scratch = [pltpu.VMEM((256, RB * qp), jnp.bfloat16)]
    else:
        kernel = _KERNELS[variant](interpret)
        scratch = ([pltpu.VMEM((256, q), jnp.bfloat16)]
                   if variant != "cw4" else [])
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[main] + halos + [w2_spec, sh_spec],
        out_specs=pl.BlockSpec(
            (1, RB, q, f) if nhwc else (1, RB, f, q),
            lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n, r_total, q, f) if nhwc else (n, r_total, f, q),
            jnp.bfloat16),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * r_total * q * 256 * f,
            bytes_accessed=st4.size * 2 * 2 + n * r_total * q * f * 2,
            transcendentals=0),
        interpret=interpret,
    )(st4, st4, st4, st4,
      w2 if nhwc else w2.T,
      shift.reshape(1, f).astype(jnp.float32) if nhwc
      else shift.reshape(f, 1).astype(jnp.float32))
    if nhwc:
        return out
    return out.transpose(0, 1, 3, 2)  # [n, R, f, q] -> NHWC rows


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def stem_conv_bn(x, w, shift, variant="bigdot", interpret=False):
    """x [N, H, W, 3], w [7, 7, 3, F] (BN-folded), shift [F] ->
    conv7x7/s2/p3(x, w) + shift, as bf16 [N, H/2, W/2, F].

    Forward runs the Pallas patch-matmul kernel; backward is the plain
    XLA conv VJP (see module docstring). ``interpret`` runs the kernel
    in the Pallas interpreter for CPU tests.
    """
    return _fwd_impl(build_st4(x), build_w2(w), shift, variant,
                     interpret)


def _vjp_fwd(x, w, shift, variant, interpret):
    return stem_conv_bn(x, w, shift, variant, interpret), (x, w)


def _vjp_bwd(variant, interpret, res, g):
    x, w = res
    gc = g.astype(x.dtype)
    _, vjp = jax.vjp(lambda x_, w_: _conv_ref(x_, w_), x,
                     w.astype(x.dtype))
    dx, dw = vjp(gc)
    return dx, dw.astype(w.dtype), jnp.sum(
        g.astype(jnp.float32), axis=(0, 1, 2))


stem_conv_bn.defvjp(_vjp_fwd, _vjp_bwd)

"""Fused relu + 3x3/2 maxpool (pad 1) as Pallas TPU kernels.

Replaces the XLA lowering of the ResNet stem's ``relu -> max_pool``
pair (d2 ``BasicStem``, consumed via ``build_resnet_backbone``;
reference call path ``distill_prop_mmss_gcnn.py:105``). XLA's backward
for this pair is a ``select-and-scatter`` op plus mask/select/layout
copies that together cost ~6 ms/step at stem shapes
([4, 400, 672, 64] bf16, PERF.md); this kernel pair recomputes the
pool argmax from the saved pre-relu input in VMEM and assembles the
input cotangent with pure vector ops — no scatter.

Semantics match XLA/torch exactly, including tie-breaking: the
cotangent of each pool window routes to the FIRST window position (row
-major scan order) attaining the max, and relu's subgradient at 0 is 0.
Window positions outside the image act as -inf (never selected).
Multi-window contributions accumulate in f32 (one rounding at the end
— tighter than XLA's bf16 scatter-add chain).

Layout strategy — Mosaic supports neither strided slices, compares on
(.., 2, C)-shaped vectors, nor in-kernel lane repacks, so the stride-2
column structure is PRE-packed outside the kernel: x is reshaped to
[N, H, W/2, 2C] (column pairs merged into lanes; for C=64 this gives
exactly 128 lanes, also removing the 2x lane-padding waste of a
64-channel block). Inside the kernel every stride-2 tap extraction is
then a sublane shift + lane slice, both natively supported. The H
window loop runs inside the kernel over a VMEM scratch so per-step
temps stay small (a fully vectorized block formulation blew the 16 MB
VMEM limit).

Shape contract (asserted): H % BH == 0 (= BH/2 output rows per grid
step) and W even — image buckets are /32-divisible so the stem's conv
output here is /16. bf16 inputs only at production widths: the f32
backward's scratch + blocks exceed the 16 MB VMEM limit (the stem
gate in models/resnet.py falls back to the XLA lowering for f32).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Input rows per grid step (BH/2 output rows). NB: one round-3
# combination (s2d stem custom-VJP active) pushed the BH=16 backward
# compile 92 KB over the 16 MB scoped-VMEM limit; with the default
# conv formulation (round-2 layouts) 16 compiles and is the
# measured-fastest value. LOCOV_POOL_BH=8 drops it when a custom conv
# VJP is enabled and the compile OOMs (the stem gate asserts H % BH).
BH = int(__import__("os").environ.get("LOCOV_POOL_BH", "16"))

_NEG = -1e30  # "-inf" pad that survives bf16 casts; relu outputs are >= 0


def _relu(x):
    # f32 in-kernel compute: Mosaic on this target rejects bf16
    # compare/max lowering ("Target does not support this comparison")
    return jnp.maximum(x.astype(jnp.float32), 0.0)


def _taps(rows_ref, t, c):
    """rows_ref[2t:2t+3] packed [*, W/2, 2C] -> 9 tap arrays
    [1, W/2, C] in row-major window order. Window q taps columns
    (2q-1, 2q, 2q+1): packed cell q holds (col 2q | col 2q+1) in its
    lane halves. Reads slice the REF (loads normalize vector offsets;
    slicing a dynamically-offset value feeds Mosaic concats an
    unsupported layout)."""
    negcell = jnp.full((1, 1, 2 * c), _NEG, jnp.float32)
    out = []
    for dr in range(3):
        row = rows_ref[pl.ds(2 * t + dr, 1)]
        # previous packed cell (cols 2q-2 | 2q-1), -inf before col 0
        prev = jnp.concatenate([negcell, rows_ref[pl.ds(2 * t + dr, 1),
                                                  :-1]], axis=1)
        out += [prev[:, :, c:], row[:, :, :c], row[:, :, c:]]
    return out


def _fwd_kernel(x_prev, x_cur, y_ref, r_ref):
    b = pl.program_id(1)
    c = y_ref.shape[-1]
    halo = _relu(x_prev[0])
    r_ref[0:1] = jnp.where(b == 0, jnp.full_like(halo, _NEG), halo)
    r_ref[1:BH + 1] = _relu(x_cur[0])

    def body(t, carry):
        v = _taps(r_ref, t, c)
        y = v[0]
        for k in range(1, 9):
            y = jnp.maximum(y, v[k])
        y_ref[0, pl.ds(t, 1)] = y.astype(y_ref.dtype)
        return carry

    jax.lax.fori_loop(0, BH // 2, body, 0)


def _bwd_kernel(x_prev, x_cur, x_next, dy_cur, dy_next, dx_ref,
                r_ref, acc_ref, tmp_ref):
    b = pl.program_id(1)
    last = pl.num_programs(1) - 1
    c = dy_cur.shape[-1]
    halo = _relu(x_prev[0])
    r_ref[0:1] = jnp.where(b == 0, jnp.full_like(halo, _NEG), halo)
    r_ref[1:BH + 1] = _relu(x_cur[0])
    tail = _relu(x_next[0])
    r_ref[BH + 1:BH + 3] = jnp.where(b == last,
                                     jnp.full_like(tail, _NEG), tail)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    tmax = BH // 2  # window rows t = 0 .. tmax inclusive

    def body(t, carry):
        v = _taps(r_ref, t, c)
        y = v[0]
        for k in range(1, 9):
            y = jnp.maximum(y, v[k])
        dcur = dy_cur[0, pl.ds(jnp.minimum(t, tmax - 1), 1)]
        dnxt = jnp.where(b == last, jnp.zeros_like(dy_next[0]),
                         dy_next[0])
        dy = jnp.where(t == tmax, dnxt, dcur).astype(jnp.float32)
        y = y.astype(jnp.float32)

        taken = jnp.zeros(y.shape, jnp.bool_)
        zerocol = jnp.zeros((1, 1, c), jnp.float32)
        for dr in range(3):
            cs = []
            for dc in range(3):
                vk = v[3 * dr + dc]
                sel = (vk == y) & ~taken
                taken = taken | sel
                cs.append(sel.astype(jnp.float32) * dy)
            # back to packed input cols: even col 2q <- dc=1 tap of
            # window q; odd col 2q+1 <- dc=2 tap of window q + dc=0
            # tap of window q+1 (zero past the right edge)
            tmp_ref[:] = cs[0]  # normalize offsets before the shift
            oddc = jnp.concatenate([tmp_ref[:, 1:], zerocol],
                                   axis=1) + cs[2]
            m = jnp.concatenate([cs[1], oddc], axis=-1)  # [1, W/2, 2C]
            ri = 2 * t + dr - 1

            @pl.when((ri >= 0) & (ri < BH))
            def _():
                rc = jnp.clip(ri, 0, BH - 1)
                acc_ref[pl.ds(rc, 1)] = acc_ref[pl.ds(rc, 1)] + m
        return carry

    jax.lax.fori_loop(0, tmax + 1, body, 0)
    dx_ref[0] = jnp.where(x_cur[0].astype(jnp.float32) > 0,
                          acc_ref[:], 0.0).astype(dx_ref.dtype)


def _clampm(j, n):
    return jnp.minimum(jnp.maximum(j, 0), n - 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def relu_maxpool(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """x: [N, H, W, C] pre-relu -> max_pool3x3/2,pad1(relu(x)):
    [N, H/2, W/2, C]. ``interpret=True`` runs the kernels in the
    Pallas interpreter (CPU tests)."""
    return _fwd_impl(x, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_impl(x, interpret=False):
    n, h, w, c = x.shape
    assert h % BH == 0 and w % 2 == 0, (h, w)
    ht = h // BH
    xp = x.reshape(n, h, w // 2, 2 * c)
    cur = pl.BlockSpec((1, BH, w // 2, 2 * c),
                       lambda i, j: (i, j, 0, 0),
                       memory_space=pltpu.VMEM)
    # 1-row halo block at row BH*j - 1 (clamped; kernel masks j == 0)
    halo = pl.BlockSpec((1, 1, w // 2, 2 * c),
                        lambda i, j: (i, _clampm(BH * j - 1, h), 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(n, ht),
        in_specs=[halo, cur],
        out_specs=pl.BlockSpec((1, BH // 2, w // 2, c),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h // 2, w // 2, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((BH + 1, w // 2, 2 * c),
                                   jnp.float32)],
        interpret=interpret,
    )(xp, xp)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bwd_impl(x, dy, interpret=False):
    n, h, w, c = x.shape
    ht = h // BH
    xp = x.reshape(n, h, w // 2, 2 * c)
    cur = pl.BlockSpec((1, BH, w // 2, 2 * c),
                       lambda i, j: (i, j, 0, 0),
                       memory_space=pltpu.VMEM)
    halo_top = pl.BlockSpec((1, 1, w // 2, 2 * c),
                            lambda i, j: (i, _clampm(BH * j - 1, h),
                                          0, 0),
                            memory_space=pltpu.VMEM)
    halo_bot = pl.BlockSpec((1, 2, w // 2, 2 * c),
                            lambda i, j: (i, _clampm(j + 1, ht) *
                                          (BH // 2), 0, 0),
                            memory_space=pltpu.VMEM)
    dy_cur = pl.BlockSpec((1, BH // 2, w // 2, c),
                          lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    dy_nxt = pl.BlockSpec((1, 1, w // 2, c),
                          lambda i, j: (i, _clampm(BH // 2 * (j + 1),
                                                   h // 2), 0, 0),
                          memory_space=pltpu.VMEM)
    dxp = pl.pallas_call(
        _bwd_kernel,
        grid=(n, ht),
        in_specs=[halo_top, cur, halo_bot, dy_cur, dy_nxt],
        out_specs=pl.BlockSpec((1, BH, w // 2, 2 * c),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w // 2, 2 * c), x.dtype),
        scratch_shapes=[pltpu.VMEM((BH + 3, w // 2, 2 * c),
                                   jnp.float32),
                        pltpu.VMEM((BH, w // 2, 2 * c), jnp.float32),
                        pltpu.VMEM((1, w // 2, c), jnp.float32)],
        interpret=interpret,
    )(xp, xp, xp, dy, dy)
    return dxp.reshape(n, h, w, c)


def _vjp_fwd(x, interpret):
    return _fwd_impl(x, interpret), x


def _vjp_bwd(interpret, x, dy):
    return (_bwd_impl(x, dy.astype(x.dtype), interpret),)


relu_maxpool.defvjp(_vjp_fwd, _vjp_bwd)

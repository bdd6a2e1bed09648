"""Stem 7x7/stride-2 conv with a space-to-depth weight-gradient.

XLA's TPU wgrad for the ResNet stem conv (7x7, stride 2, THREE input
channels) runs at ~1% MXU efficiency — 5.7 ms/step at LSM shapes for a
9,408-parameter gradient (PERF.md round 3), because 3 channels occupy
3/128 lanes in every tap. This module keeps XLA's forward and
input-gradient (both fine) and replaces only the weight gradient:

    7x7/s2 conv on 3 channels  ==  4x4/s1 conv on the 2x2
    space-to-depth repack (12 channels, kernel zero-padded to 8x8)

so dW becomes `conv_general_dilated_patches` over the 12-channel
repack (16 taps x 12 = 192 lanes, 8-aligned) contracted against the
output cotangent in ONE [M, 192]^T @ [M, 64] matmul (M ~ 1.07M
pixels), then a static scatter of the 8x8 entries back onto the 7x7
kernel (the ky==7 / kx==7 rows are gradients of zero-padding, simply
dropped). The earlier direct patches+einsum attempt on the RAW 3-channel
form (49 taps x 3 = 147 unaligned lanes) measured SLOWER than XLA's
wgrad (round-2 dead end); the s2d repack is what makes the matmul
MXU-shaped.

Numerics: identical contraction set, f32 accumulation (same as the
MXU's internal conv accumulation); golden-tested against jax.grad of
the plain conv (tests/test_stem_conv.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def _conv(x, w):
    return lax.conv_general_dilated(
        x, w, (2, 2), [(3, 3), (3, 3)], dimension_numbers=_DN)


@jax.custom_vjp
def conv7x7s2(x, w):
    """x [N, H, W, 3] (H, W even), w [7, 7, C_in, F] -> conv, pad 3."""
    return _conv(x, w)


def _fwd(x, w):
    return _conv(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    n, h, wid, c = x.shape
    f = w.shape[3]

    # dx: XLA's transposed-conv path is efficient; reuse it
    _, vjp_x = jax.vjp(lambda x_: _conv(x_, w), x)
    dx, = vjp_x(g)

    # dW via space-to-depth: pad 3 on each side -> [H+6, W+6] (even),
    # repack 2x2 blocks into channels -> [N, (H+6)/2, (W+6)/2, 4c]
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    h2, w2 = (h + 6) // 2, (wid + 6) // 2
    xs = xp.reshape(n, h2, 2, w2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(n, h2, w2, 4 * c)
    # patches at every output pixel: [N, Ho, Wo, 4c*16], feature dim
    # ordered channel-major then (ky, kx) (conv_general_dilated_patches
    # convention: size C * prod(filter), c slowest)
    p = lax.conv_general_dilated_patches(
        xs, (4, 4), (1, 1), "VALID", dimension_numbers=_DN)
    m = n * (h // 2) * (wid // 2)
    dw48 = jnp.einsum(
        "mk,mf->kf", p.reshape(m, 4 * c * 16), g.reshape(m, f),
        preferred_element_type=jnp.float32)       # [4c*16, F]
    # unpack: k = ((b*2 + b')*c + ch)*16 + (a*4 + a'); kernel tap
    # (ky, kx) = (2a + b, 2a' + b'); drop ky==7 / kx==7 (zero-pad rows)
    dw48 = dw48.reshape(2, 2, c, 4, 4, f)         # [b, b', ch, a, a', f]
    dw88 = jnp.transpose(dw48, (3, 0, 4, 1, 2, 5))  # [a, b, a', b', c, f]
    dw88 = dw88.reshape(8, 8, c, f)
    return dx, dw88[:7, :7].astype(w.dtype)


conv7x7s2.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------- 1x1
def _conv1(x, w2d, stride):
    return lax.conv_general_dilated(
        x, w2d[None, None], (stride, stride), "VALID",
        dimension_numbers=_DN)


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv1x1(x, w2d, stride=1):
    """1x1 conv, XLA forward, dot-formulated weight gradient.

    XLA's TPU conv-wgrad for 1x1 kernels measured ~8x off a plain
    transposed dot at res5 shapes (fusion.107, 6.4 ms for a
    [1,1,1024,2048] gradient; PERF.md round 3), while its forward and
    input-gradient convs are well-shaped — so only dW is replaced. (An
    earlier variant ran the whole 1x1 as an einsum: train got the same
    wgrad win but EVAL regressed 54 -> 46 img/s from the changed
    forward layouts; keeping the conv forward preserves both.)

    x [N, H, W, C]; w2d [C, F]."""
    return _conv1(x, w2d, stride)


def _c1_fwd(x, w2d, stride):
    # (custom_vjp fwd keeps the primal signature; only bwd receives
    # the nondiff args first)
    return _conv1(x, w2d, stride), (x, w2d)


def _c1_bwd(stride, res, g):
    x, w2d = res
    _, vjp_x = jax.vjp(lambda x_: _conv1(x_, w2d, stride), x)
    dx, = vjp_x(g)
    xs = x[:, ::stride, ::stride] if stride > 1 else x
    c, f = w2d.shape
    dw = jnp.einsum("mc,mf->cf", xs.reshape(-1, c), g.reshape(-1, f),
                    preferred_element_type=jnp.float32)
    return dx, dw.astype(w2d.dtype)


conv1x1.defvjp(_c1_fwd, _c1_bwd)


# ---------------------------------------------------- small-spatial 3x3
def _conv3(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=_DN)


@jax.custom_vjp
def conv3x3(x, w):
    """3x3/stride-1/pad-1 conv, XLA forward + dx, ONE-matmul weight
    gradient — for the SMALL-SPATIAL res5 case ([~800 ROIs, 7, 7, C]
    after the stride-in-1x1 conv1), where XLA's spatial wgrad
    convolution is the profiled gap between res5's 25 ms and its
    ~8.5 ms MXU FLOPs floor (PERF.md round-4 profile; reference res5 =
    d2 ``ResNet.make_stage``, /root/reference/ovr/modeling/roi_heads/
    roi_emb_heads.py:216-241).

    dW is computed as patches(x_pad) contracted against the output
    cotangent in one [M, 9C]^T @ [M, F] matmul (M = N·H·W ≈ 39k rows at
    res5 shapes — contraction-deep and lane-aligned, 9C = 4608 for
    C=512). The patches tensor is 9x the activation (≈360 MB bf16 at
    res5 train shapes) — affordable ONLY at small spatial dims; callers
    gate on H*W (resnet.py). Identical contraction set to the conv
    wgrad, f32 accumulation; golden vs jax.grad of the plain conv
    (tests/test_stem_conv.py)."""
    return _conv3(x, w)


def _c3_fwd(x, w):
    return _conv3(x, w), (x, w)


def _c3_bwd(res, g):
    x, w = res
    _, vjp_x = jax.vjp(lambda x_: _conv3(x_, w), x)
    dx, = vjp_x(g)
    n, h, wd, c = x.shape
    f = w.shape[3]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    m = n * h * wd
    gm = g.reshape(m, f)
    # nine shifted-slice dots, NOT conv_general_dilated_patches (the
    # patches op is pathological on TPU — measured at the stem round 3
    # AND here: a patches-form of THIS wgrad benched 21.3 vs 32.9
    # img/s on the full LSM step)
    taps = []
    for ky in range(3):
        for kx in range(3):
            xs = lax.slice(xp, (0, ky, kx, 0), (n, ky + h, kx + wd, c))
            taps.append(jnp.einsum(
                "mc,mf->cf", xs.reshape(m, c), gm,
                preferred_element_type=jnp.float32))
    dw = jnp.stack(taps).reshape(3, 3, c, f)
    return dx, dw.astype(w.dtype)


conv3x3.defvjp(_c3_fwd, _c3_bwd)

"""Data-free int8 quantized convolution for the serving path.

The v5e MXU runs int8 x int8 -> int32 at ~2x the bf16 rate (measured
259 TOP/s vs 148 TFLOP/s at the res5 conv shape — tools/bench_int8.py),
and int8 activations halve HBM traffic on the bandwidth-bound 1x1
convs. STT eval is floored by res5 on 8000 box crops (~66 ms of a
~148 ms batch at bf16, PERF.md), which makes post-training int8 the
only remaining eval lever.

Scheme (standard data-free PTQ, no calibration set needed):
  - weights: symmetric per-OUTPUT-channel scales (max-abs / 127). The
    FrozenBN fold happens BEFORE quantization (models/resnet.py), so
    the per-channel BN scale variation is absorbed by the per-channel
    quant scale — the classic reason per-channel is near-lossless on
    BN-folded ResNets.
  - activations: symmetric per-tensor DYNAMIC scale (max-abs / 127),
    computed on the fly each forward. One extra read of x; the convs
    this wraps are MXU-bound, so the reduce overlaps.
  - conv int8 x int8 with int32 accumulation, dequantized in f32 by
    (s_x * s_w[O]), cast back to the compute dtype.

Inference-only by construction: the quantize rounding has no useful
gradient and the training path never calls this (gated by the
``int8`` call-time flag threaded through ResNet — see
models/resnet.py / meta_arch/ovr_rcnn.py, cfg key TPU.INT8_EVAL).

Reference parity note: the reference (lmb-freiburg/locov) has no
quantized path; this is an opt-in TPU serving feature, default OFF.
AP impact must be validated on real data before production use
(per-channel weight PTQ on BN-folded ResNets typically costs <0.5 AP).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_QMAX = 127.0


class QuantizedTensor(NamedTuple):
    """An int8 tensor with its (per-tensor) dequantization scale.
    Produced by fusing the static quantize into a producer's epilogue
    (e.g. ROIAlign's chunk einsums) so the activation is written to
    HBM once, as int8, instead of bf16 + a separate quantize pass."""
    q: jnp.ndarray       # int8
    scale: jnp.ndarray   # f32 scalar


def quantize_per_tensor(x: jnp.ndarray):
    """Symmetric per-tensor int8 quantization. Returns (q, scale)."""
    scale = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))) / _QMAX,
                        1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -_QMAX, _QMAX)
    return q.astype(jnp.int8), scale


def quantize_weight_per_channel(w: jnp.ndarray):
    """Symmetric per-output-channel int8 quantization of an HWIO
    kernel. Returns (q [k,k,I,O] int8, scale [O] f32)."""
    wf = w.astype(jnp.float32)
    scale = jnp.maximum(
        jnp.max(jnp.abs(wf), axis=(0, 1, 2)) / _QMAX, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -_QMAX, _QMAX)
    return q.astype(jnp.int8), scale


def quantize_per_tensor_static(x: jnp.ndarray, amax: jnp.ndarray):
    """Symmetric int8 quantization with a precomputed (calibrated)
    max-abs. No reduce over ``x`` — the whole point: XLA can fuse the
    round/clip/cast into the producer's epilogue so the tensor is
    written once, as int8 (half the bytes of bf16). Values beyond the
    calibrated range saturate."""
    scale = jnp.maximum(amax.astype(jnp.float32) / _QMAX, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -_QMAX, _QMAX)
    return q.astype(jnp.int8), scale


def _int8_conv_core(xq, wq, stride, pad):
    return jax.lax.conv_general_dilated(
        xq, wq, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def conv_int8(x, w: jnp.ndarray, stride: int, pad: int,
              out_dtype=None, amax=None) -> jnp.ndarray:
    """NHWC x HWIO conv computed in int8 with int32 accumulation.

    ``x`` float [B,H,W,C] — or a ``QuantizedTensor`` already written as
    int8 by a producer epilogue (then ``out_dtype`` is required and the
    quantize here is skipped entirely); ``w`` float [k,k,I,O]
    (FrozenBN-folded). Output is float (``out_dtype`` or ``x.dtype``),
    dequantized by the activation scale times the per-channel weight
    scales. With ``amax`` (a calibrated scalar) the activation scale is
    static — the fast scheme; without, it is computed on the fly
    (dynamic — measured a net LOSS at production activation sizes,
    PERF.md).
    """
    if isinstance(x, QuantizedTensor):
        xq, sx = x.q, x.scale
        assert out_dtype is not None
    elif amax is None:
        xq, sx = quantize_per_tensor(x)
    else:
        xq, sx = quantize_per_tensor_static(x, amax)
    wq, sw = quantize_weight_per_channel(w)
    acc = _int8_conv_core(xq, wq, stride, pad)
    out = acc.astype(jnp.float32) * (sx * sw)
    return out.astype(out_dtype or x.dtype)

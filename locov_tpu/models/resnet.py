"""ResNet-50 C4 backbone in Flax (NHWC, TPU-native).

From-scratch replacement for detectron2's ``build_resnet_backbone`` +
``ResNet.make_stage`` (used by the reference via ``build_backbone``,
``distill_prop_mmss_gcnn.py:105``, and for the per-head res5 block,
``roi_emb_heads.py:230-241``). Caffe conventions are preserved so the
published torch checkpoints can be imported: BGR pixel order handled by
the data pipeline, ``stride_in_1x1`` bottlenecks, and FrozenBatchNorm
(all four buffers kept as parameters for checkpoint fidelity; the
solver masks every FrozenBN parameter out of the optimizer, matching
``requires_grad=False`` in d2).

Stage freezing (MODEL.BACKBONE.FREEZE_AT, d2 semantics: 1 = stem,
2 = +res2, ...) is likewise enforced by the optimizer mask — see
``locov_tpu/engine/solver.py``.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# stage name -> (num_blocks for R50, stride of first block)
R50_STAGES = {"res2": (3, 1), "res3": (4, 2), "res4": (6, 2),
              "res5": (3, 2)}
R101_STAGES = {"res2": (3, 1), "res3": (4, 2), "res4": (23, 2),
               "res5": (3, 2)}
STAGE_CHANNELS = {"res2": (64, 256), "res3": (128, 512),
                  "res4": (256, 1024), "res5": (512, 2048)}
STAGE_STRIDES = {"stem": 4, "res2": 4, "res3": 8, "res4": 16, "res5": 32}


class FrozenBatchNorm(nn.Module):
    """BatchNorm with permanently-frozen statistics and affine params
    (d2 FrozenBatchNorm2d). All four tensors live in 'params' so torch
    checkpoints import 1:1; none of them ever receives gradient.

    Standalone form kept for API/testing; the trunk itself uses the
    folded ``_conv_frozen_bn`` path (same param tree, conv-fused math).
    """
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros,
                          (self.features,))
        var = self.param("running_var", nn.initializers.ones,
                         (self.features,))
        scale = weight / jnp.sqrt(var + self.eps)
        shift = bias - mean * scale
        return x * scale.astype(x.dtype) + shift.astype(x.dtype)


class _ConvKernel(nn.Module):
    """Parameter holder with the exact param path of ``nn.Conv``
    (``<name>/kernel``, HWIO) so checkpoints import unchanged."""
    shape: Sequence[int]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.variance_scaling(
            2.0, "fan_out", "truncated_normal"), tuple(self.shape))


class _BNParams(nn.Module):
    """Parameter holder matching ``FrozenBatchNorm``'s param paths."""
    features: int

    @nn.compact
    def __call__(self):
        f = (self.features,)
        return (self.param("weight", nn.initializers.ones, f),
                self.param("bias", nn.initializers.zeros, f),
                self.param("running_mean", nn.initializers.zeros, f),
                self.param("running_var", nn.initializers.ones, f))


class _ActAmax(nn.Module):
    """Calibrated activation max-abs for the static int8 scheme, in
    its own ``quant`` collection (so checkpoints' ``params`` surface
    is untouched; orbax serializes extra collections transparently)."""

    @nn.compact
    def __call__(self):
        return self.variable("quant", "amax",
                             lambda: jnp.zeros((), jnp.float32))


def _conv_frozen_bn(x, features, kernel, stride, name, dtype,
                    relu=True, eps=1e-5, int8=False):
    """conv + FrozenBN + (relu), with the BN affine folded into the
    conv kernel: ``conv(x, w) * s + t == conv(x, w * s) + t``.

    FrozenBN is frozen by definition (d2 FrozenBatchNorm2d), so its
    scale/shift are ``stop_gradient``-ed constants: this removes the
    per-activation multiply over the full feature map in forward AND
    the (never-used) dscale/dshift activation-sized reductions in
    backward — the elementwise tail was the measured bandwidth cost of
    the trunk (PERF.md). Param tree is byte-identical to the unfused
    ``nn.Conv`` + ``FrozenBatchNorm`` form.

    ``dtype`` is the computation dtype: the fold happens in f32, then
    one cast — params stay f32 (flax convention).
    """
    from ..ops.int8_conv import QuantizedTensor
    xa = x.q if isinstance(x, QuantizedTensor) else x
    kern = _ConvKernel((kernel, kernel, xa.shape[-1], features),
                       name=name)()
    w, b, m, v = _BNParams(features, name=name + "_norm")()
    scale = jax.lax.stop_gradient(w / jnp.sqrt(v + eps))
    shift = jax.lax.stop_gradient(b - m * scale)
    wk = kern * scale
    cdt = dtype or wk.dtype
    pad = (kernel - 1) // 2
    if int8:
        # opt-in int8 serving path (TPU.INT8_EVAL): per-channel weight
        # scale on the BN-FOLDED kernel; activation scale per mode
        # (ops/int8_conv.py). Inference-only — the callers gate this
        # off every training path. Modes:
        #   True/"dynamic" — per-tensor max computed on the fly
        #     (measured a net LOSS at production sizes: the reduce +
        #     unfused quantize passes outweigh the MXU win, PERF.md)
        #   "calibrate"   — dynamic, AND records the running max into
        #     the mutable "quant" collection (apply with
        #     mutable=["quant"])
        #   "static"      — uses the calibrated max: no reduce, and
        #     the quantize fuses into the producer epilogue
        from ..ops.int8_conv import conv_int8
        if isinstance(x, QuantizedTensor):
            # producer epilogue already quantized this activation
            # (e.g. ROIAlign chunk einsums, roi_heads.py) — its amax
            # var here goes unused in that flow
            out = conv_int8(x, wk, stride, pad, out_dtype=cdt)
        else:
            amax = None
            if int8 in ("static", "calibrate"):
                var = _ActAmax(name=name + "_amax")()
                if int8 == "calibrate":
                    cur = jnp.max(jnp.abs(x.astype(jnp.float32)))
                    var.value = jnp.maximum(var.value, cur)
                amax = var.value
            out = conv_int8(x.astype(cdt), wk, stride, pad,
                            out_dtype=cdt, amax=amax)
        out = out + shift.astype(out.dtype)
        return nn.relu(out) if relu else out
    if kernel == 1 and \
            __import__("os").environ.get("LOCOV_DOT_1X1_WGRAD") == "1":
        # XLA conv forward + dot-formulated weight gradient
        # (ops/stem_conv.py:conv1x1). MEASURED DEAD END (clean same-
        # session A/B, late round 3): 32.24 vs 32.57 img/s default —
        # the wgrad dot is ~8x faster in isolation (fusion.107) but
        # loses in the full step; a full-einsum variant also regressed
        # EVAL 54 -> 46. Kept only as recorded evidence (PERF.md).
        from ..ops.stem_conv import conv1x1
        out = conv1x1(x.astype(cdt), wk[0, 0].astype(cdt), stride)
    elif kernel == 3 and stride == 1 and \
            x.shape[1] * x.shape[2] <= 256 and \
            __import__("os").environ.get("LOCOV_DOT_3X3_WGRAD") == "1":
        # small-spatial (res5 ROI path) 3x3: XLA fwd/dx + dot-formulated
        # wgrad (ops/stem_conv.py:conv3x3), targeting the profiled res5
        # wgrad gap (PERF.md round-4). MEASURED DEAD END #8 (round-5
        # same-session A/B): 9-slice-dot form NEUTRAL (33.35/33.28 vs
        # 32.93/33.41 img/s baseline); a conv_general_dilated_patches
        # form catastrophic (21.3 — the patches op is pathological on
        # TPU, third confirmation). Evidence only; the H*W gate keeps
        # it off the big-spatial trunk and LSM grid paths.
        from ..ops.stem_conv import conv3x3
        out = conv3x3(x.astype(cdt), wk.astype(cdt))
    elif kernel == 7 and stride == 2 and \
            __import__("os").environ.get("LOCOV_S2D_STEM_WGRAD") == "1":
        # stem conv: custom wgrad via space-to-depth (ops/stem_conv.py)
        # MEASURED DEAD END (clean A/B, late round 3): 25.88 vs 32.57
        # img/s (with the required LOCOV_POOL_BH=8). Evidence only.
        from ..ops.stem_conv import conv7x7s2
        out = conv7x7s2(x.astype(cdt), wk.astype(cdt))
    else:
        out = jax.lax.conv_general_dilated(
            x.astype(cdt), wk.astype(cdt), (stride, stride),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = out + shift.astype(out.dtype)
    return nn.relu(out) if relu else out


class BottleneckBlock(nn.Module):
    """Caffe-style bottleneck: 1x1 (stride here when stride_in_1x1) ->
    3x3 -> 1x1, FrozenBN after each, residual add, relu."""
    bottleneck_channels: int
    out_channels: int
    stride: int = 1
    stride_in_1x1: bool = True
    has_shortcut: bool = False
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x, int8=False):
        s1 = self.stride if self.stride_in_1x1 else 1
        s3 = 1 if self.stride_in_1x1 else self.stride
        dt = self.compute_dtype

        out = _conv_frozen_bn(x, self.bottleneck_channels, 1, s1,
                              "conv1", dt, int8=int8)
        out = _conv_frozen_bn(out, self.bottleneck_channels, 3, s3,
                              "conv2", dt, int8=int8)
        out = _conv_frozen_bn(out, self.out_channels, 1, 1, "conv3", dt,
                              relu=False, int8=int8)
        if self.has_shortcut:
            sc = _conv_frozen_bn(x, self.out_channels, 1, self.stride,
                                 "shortcut", dt, relu=False, int8=int8)
        else:
            sc = x
        return nn.relu(out + sc)


class ResNetStage(nn.Module):
    """A sequence of bottleneck blocks (d2 ResNet.make_stage)."""
    num_blocks: int
    bottleneck_channels: int
    out_channels: int
    first_stride: int = 2
    stride_in_1x1: bool = True
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x, int8=False):
        for i in range(self.num_blocks):
            x = BottleneckBlock(
                bottleneck_channels=self.bottleneck_channels,
                out_channels=self.out_channels,
                stride=self.first_stride if i == 0 else 1,
                stride_in_1x1=self.stride_in_1x1,
                has_shortcut=(i == 0),
                compute_dtype=self.compute_dtype,
                name=str(i))(x, int8=int8)
        return x


class ResNetStem(nn.Module):
    """7x7/2 conv + FrozenBN + relu + 3x3/2 maxpool.

    relu+maxpool run as a fused Pallas kernel pair on TPU (exact
    forward AND backward semantics incl. tie-breaking; see
    ``ops/pallas_pool.py``) — XLA's select-and-scatter backward plus
    its layout copies cost ~6 ms/step at LSM stem shapes. Off-TPU or
    on non-/16 shapes it falls back to the plain XLA lowering."""
    out_channels: int = 64
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = _conv_frozen_bn(x, self.out_channels, 7, 2, "conv1",
                            self.compute_dtype, relu=False)
        # bf16-only: the f32 backward kernel exceeds the 16 MB VMEM
        # limit at production stem widths. Fused path is TPU-only:
        # interpret-mode Pallas is orders of magnitude slower than the
        # plain XLA lowering, so off-TPU it is opt-in via
        # LOCOV_PALLAS_INTERPRET=1 (test coverage of the kernel logic
        # on tiny shapes only).
        import os
        on_tpu = jax.default_backend() == "tpu"
        if (x.shape[1] % 16 == 0 and x.shape[2] % 2 == 0
                and x.dtype == jnp.bfloat16
                and (on_tpu
                     or os.environ.get("LOCOV_PALLAS_INTERPRET") == "1")):
            from ..ops.pallas_pool import relu_maxpool
            return relu_maxpool(x, not on_tpu)
        x = nn.relu(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))


class ResNetC4(nn.Module):
    """Stem + res2..res4 (the C4 trunk; res5 lives in the ROI heads).

    Returns a dict of the requested ``out_features``. With ``remat``
    each stage is rematerialized on the backward pass
    (jax.checkpoint), trading ~30% extra FLOPs for large activation-
    memory savings (TPU.REMAT_BACKBONE).
    """
    depth: int = 50
    out_features: Sequence[str] = ("res4",)
    num_groups: int = 1
    width_per_group: int = 64
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    stride_in_1x1: bool = True
    compute_dtype: Any = jnp.float32
    remat: bool = False
    # d2 BACKBONE.FREEZE_AT semantics: 1 freezes the stem, i >= 2
    # freezes stages up to res{i}. Implemented as stop_gradient at the
    # freeze boundary — optimizer masking alone still pays the full
    # backward through the frozen stages (largest spatial dims), since
    # pmean/clipping consume every grad leaf.
    freeze_at: int = 0

    @nn.compact
    def __call__(self, x, int8=False) -> Dict[str, jnp.ndarray]:
        x = x.astype(self.compute_dtype)
        stages = R50_STAGES if self.depth == 50 else R101_STAGES
        outputs = {}
        # the stem stays bf16 even under int8: its 3-channel 7x7 conv
        # is shape-pathological on the MXU (PERF.md dead-end log) and
        # int8 can't fix the lane padding; the win lives in res2-res5
        x = ResNetStem(self.stem_out_channels,
                       compute_dtype=self.compute_dtype, name="stem")(x)
        if self.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)
        if "stem" in self.out_features:
            outputs["stem"] = x
        last = max((s for s in self.out_features if s != "stem"),
                   key=lambda s: STAGE_STRIDES[s])
        # int8 is inference-only (no backward), so remat — whose lifted
        # transform would trace the python flag — is bypassed there;
        # the flag is only ever passed as a kwarg OUTSIDE remat
        stage_cls = ResNetStage if (int8 or not self.remat) \
            else nn.remat(ResNetStage)
        for stage in ["res2", "res3", "res4", "res5"]:
            nblocks, stride = stages[stage]
            bc, oc = STAGE_CHANNELS[stage]
            bc = bc * self.num_groups * self.width_per_group // 64
            oc = oc * self.res2_out_channels // 256
            mod = stage_cls(nblocks, bc, oc, first_stride=stride,
                            stride_in_1x1=self.stride_in_1x1,
                            compute_dtype=self.compute_dtype,
                            name=stage)
            x = mod(x, int8=int8) if int8 else mod(x)
            if self.freeze_at >= int(stage[3]):
                x = jax.lax.stop_gradient(x)
            if stage in self.out_features:
                outputs[stage] = x
            if stage == last:
                break
        return outputs


def build_res5_stage(cfg, compute_dtype=jnp.float32) -> ResNetStage:
    """The standalone res5 block used as the C4 box head
    (d2 ``_build_res5_block``, reference roi_emb_heads.py:217-241)."""
    num_groups = cfg.MODEL.RESNETS.NUM_GROUPS
    width_per_group = cfg.MODEL.RESNETS.WIDTH_PER_GROUP
    bottleneck = num_groups * width_per_group * 8
    out_channels = cfg.MODEL.RESNETS.RES2_OUT_CHANNELS * 8
    return ResNetStage(
        num_blocks=3, bottleneck_channels=bottleneck,
        out_channels=out_channels, first_stride=2,
        stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
        compute_dtype=compute_dtype, name="res5")


def build_resnet_backbone(cfg, compute_dtype=jnp.float32) -> ResNetC4:
    return ResNetC4(
        depth=cfg.MODEL.RESNETS.DEPTH,
        out_features=tuple(cfg.MODEL.RESNETS.OUT_FEATURES),
        num_groups=cfg.MODEL.RESNETS.NUM_GROUPS,
        width_per_group=cfg.MODEL.RESNETS.WIDTH_PER_GROUP,
        stem_out_channels=cfg.MODEL.RESNETS.STEM_OUT_CHANNELS,
        res2_out_channels=cfg.MODEL.RESNETS.RES2_OUT_CHANNELS,
        stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
        compute_dtype=compute_dtype,
        remat=cfg.TPU.REMAT_BACKBONE,
        freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT)

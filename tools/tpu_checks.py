#!/usr/bin/env python
"""On-device validation battery for the real TPU.

The pytest suite runs on a forced-CPU 8-device mesh (tests/conftest.py)
— correct for logic, but structurally blind to TPU-only failure modes:
default-precision bf16 MXU rounding, Mosaic compilation, VMEM limits.
Both round-2 device bugs (NMS survivor-buffer bf16 rounding, Pallas
pool f32 VMEM OOM) were invisible to the CPU suite. This script runs
the device-sensitive checks on the real chip and prints PASS/FAIL per
check plus a one-line summary. Run it after touching any op with a
precision= knob, a Pallas kernel, or dtype gating:

    python tools/tpu_checks.py            # ~2-4 min warm cache

Checks:
  1. nms_topk exactness vs brute-force greedy (clustered boxes at
     production coordinate scale, several tiles, compacted-buffer path)
  2. batched per-class NMS exactness vs greedy per class
  3. Pallas relu+maxpool fwd bit-exactness + bwd vs XLA lowering (bf16
     at the production stem shape)
  4. ROIAlign "default" (bf16) path vs "highest" within bf16 tolerance
  5. f32 stem path compiles (the bf16-only Pallas gate falls back)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from locov_tpu.utils.misc import compile_cache_dir
jax.config.update("jax_compilation_cache_dir", compile_cache_dir())

FAILED = []


def check(name, ok, detail=""):
    print(f"[{'PASS' if ok else 'FAIL'}] {name}" +
          (f" — {detail}" if detail and not ok else ""))
    if not ok:
        FAILED.append(name)


def _greedy_ref(boxes, scores, thresh):
    order = np.argsort(-scores, kind="stable")
    suppressed = np.zeros(len(boxes), bool)
    keep = []
    for pos, i in enumerate(order):
        if suppressed[i]:
            continue
        keep.append(i)
        bi = boxes[i]
        for j in order[pos + 1:]:
            if suppressed[j]:
                continue
            bj = boxes[j]
            ix0 = max(bi[0], bj[0]); iy0 = max(bi[1], bj[1])
            ix1 = min(bi[2], bj[2]); iy1 = min(bi[3], bj[3])
            inter = max(ix1 - ix0, 0) * max(iy1 - iy0, 0)
            if inter <= 0:
                continue
            a = (bi[2] - bi[0]) * (bi[3] - bi[1])
            b = (bj[2] - bj[0]) * (bj[3] - bj[1])
            if inter / (a + b - inter) > thresh:
                suppressed[j] = True
    return sorted(keep)


def _boxes(rng, n, scale=1344.0):
    centers = rng.rand(max(n // 8, 1), 2) * scale
    c = centers[rng.randint(len(centers), size=n)] + rng.randn(n, 2) * 40
    wh = rng.rand(n, 2) * 200 + 30
    return np.concatenate([c - wh / 2, c + wh / 2], 1).astype(np.float32)


def check_nms_topk():
    from locov_tpu.ops import nms as N
    rng = np.random.RandomState(1)
    bad = 0
    trials = 12
    for _ in range(trials):
        n, k = 900, 250
        boxes = _boxes(rng, n)
        scores = rng.rand(n).astype(np.float32)
        idx, ok = jax.jit(
            lambda b, s: N.nms_topk_batched(
                b[None], s[None], jnp.ones((1, n), bool), 0.5, k)
        )(jnp.asarray(boxes), jnp.asarray(scores))
        got = np.asarray(idx)[0][np.asarray(ok)[0]].tolist()
        surv = _greedy_ref(boxes, scores, 0.5)
        want = sorted(surv, key=lambda i: -scores[i])[:k]
        if got != want[:len(got)] or len(got) != min(k, len(want)):
            bad += 1
    check("nms_topk exact vs greedy (compacted buffer, TPU)", bad == 0,
          f"{bad}/{trials} trials diverged")


def check_batched_nms():
    from locov_tpu.ops import nms as N
    rng = np.random.RandomState(2)
    boxes = _boxes(rng, 400)
    scores = rng.rand(400).astype(np.float32)
    classes = rng.randint(0, 5, size=400)
    keep = np.asarray(jax.jit(
        lambda b, s, c: N.batched_nms_mask_batched(
            b[None], s[None], c[None], jnp.ones((1, 400), bool), 0.5)
    )(jnp.asarray(boxes), jnp.asarray(scores),
      jnp.asarray(classes)))[0]
    ok = True
    detail = []
    for c in range(5):
        m = classes == c
        want = _greedy_ref(boxes[m], scores[m], 0.5)
        got = sorted(np.nonzero(keep[m])[0].tolist())
        if got != want:
            ok = False
            detail.append(f"cls{c}: got{set(got) - set(want)}"
                          f" missing{set(want) - set(got)}")
    check("batched per-class NMS exact vs greedy (TPU)", ok,
          "; ".join(detail))


def check_batched_nms_compacted():
    """Class-aware compacted stop_after path at production coordinate
    scale (the fast_rcnn inference configuration: 4096 candidates,
    65 classes, top-100 consumer) — exactness of the returned top-k
    on device, where f32 rounding of the survivor-buffer insert is the
    failure mode CPU tests cannot see."""
    from locov_tpu.ops import nms as N
    rng = np.random.RandomState(7)
    n, k, ncls = 4096, 100, 65
    boxes = _boxes(rng, n)
    scores = rng.rand(n).astype(np.float32)
    classes = rng.randint(0, ncls, size=n)
    keep = np.asarray(jax.jit(
        lambda b, s, c: N.batched_nms_mask_batched(
            b[None], s[None], c[None], jnp.ones((1, n), bool), 0.5,
            stop_after=k)
    )(jnp.asarray(boxes), jnp.asarray(scores),
      jnp.asarray(classes)))[0]
    surv = []
    for c in np.unique(classes):
        m = np.nonzero(classes == c)[0]
        surv += [int(m[i]) for i in
                 _greedy_ref(boxes[m], scores[m], 0.5)]
    want = sorted(surv, key=lambda i: -scores[i])[:k]
    kept_scores = np.where(keep, scores, -np.inf)
    got = [int(i) for i in np.argsort(-kept_scores, kind="stable")[:k]
           if kept_scores[i] > -np.inf]
    check("class-aware compacted NMS top-k exact (TPU, 4096x65)",
          got == want,
          f"{len(set(got) ^ set(want))} symmetric-diff items")


def check_pallas_pool():
    from flax import linen as nn
    from locov_tpu.ops.pallas_pool import relu_maxpool
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 400, 672, 64).astype(np.float32)
                    ).astype(jnp.bfloat16)
    dy = jnp.asarray(rng.randn(4, 200, 336, 64).astype(np.float32)
                     ).astype(jnp.bfloat16)

    def ref(t):
        return nn.max_pool(nn.relu(t), (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))

    fwd_ok = bool(jnp.all(relu_maxpool(x) == ref(x)))
    g1 = jax.jit(jax.grad(lambda t: (
        relu_maxpool(t).astype(jnp.float32)
        * dy.astype(jnp.float32)).sum()))(x)
    g2 = jax.jit(jax.grad(lambda t: (
        ref(t).astype(jnp.float32)
        * dy.astype(jnp.float32)).sum()))(x)
    d = float(jnp.max(jnp.abs(g1.astype(jnp.float32)
                              - g2.astype(jnp.float32))))
    # bf16 summation-order differences only (kernel accumulates f32)
    bwd_ok = d <= 0.25
    check("pallas relu+maxpool fwd bit-exact (TPU, stem shape)", fwd_ok)
    check("pallas relu+maxpool bwd vs XLA (bf16 tol)", bwd_ok,
          f"max|diff|={d}")


def check_roi_align_precision():
    from locov_tpu.ops.roi_align import roi_align_batched
    rng = np.random.RandomState(4)
    feat = jnp.asarray(rng.rand(2, 50, 84, 256).astype(np.float32))
    xy = rng.rand(2, 64, 2) * 1000
    wh = rng.rand(2, 64, 2) * 300 + 16
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1)
                        .astype(np.float32))
    hi = roi_align_batched(feat, boxes, 1 / 16, 14, 2,
                           precision="highest")
    lo = roi_align_batched(feat.astype(jnp.bfloat16), boxes, 1 / 16,
                           14, 2, precision="default")
    rel = float(jnp.max(jnp.abs(hi - lo.astype(jnp.float32)))
                / jnp.max(jnp.abs(hi)))
    check("ROIAlign bf16 path within bf16 tolerance of exact", rel < 2e-2,
          f"rel={rel}")


def check_roi_align_int8():
    """Full-int8 ROIAlign (TPU.INT8_ROIALIGN serving default) lowers on
    TPU and stays within int8 resolution of the exact-interpolation
    quant path — the int8x int8 MXU einsums and the fused requantize
    epilogues are exactly what CPU pytest cannot exercise."""
    from locov_tpu.ops.roi_align import (roi_align_batched,
                                         roi_align_batched_int8,
                                         roi_align_batched_quant)
    rng = np.random.RandomState(6)
    feat = jnp.asarray(
        (rng.randn(2, 50, 84, 256) * 2).astype(np.float32))
    xy = rng.rand(2, 300, 2) * 1000
    wh = rng.rand(2, 300, 2) * 300 + 16
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1)
                        .astype(np.float32))
    amax_in = jnp.max(jnp.abs(feat))
    pooled = roi_align_batched(feat, boxes, 1 / 16, 14, 0)
    amax_pool = jnp.max(jnp.abs(pooled))
    try:
        q8, s8 = jax.jit(lambda f, b: roi_align_batched_int8(
            f, b, 1 / 16, amax_in, amax_pool, 14, 0))(feat, boxes)
        qr, sr = jax.jit(lambda f, b: roi_align_batched_quant(
            f, b, 1 / 16, amax_pool, 14, 0))(feat, boxes)
    except Exception as e:  # noqa: BLE001 — report, don't crash
        check("int8 ROIAlign lowers + parity on TPU", False,
              repr(e)[:160])
        return
    diff = np.abs(np.asarray(q8, np.float32) * float(s8)
                  - np.asarray(qr, np.float32) * float(sr))
    # analytic budget ~3.5 steps (see test_roi_align_int8_parity_vs_
    # quant); measured worst case at these shapes: 1.7 steps
    tol = 3.5 * max(float(amax_in), float(amax_pool)) / 127.0
    check("int8 ROIAlign lowers + parity on TPU",
          float(diff.max()) <= tol + 1e-6,
          f"maxdiff {diff.max():.4f} tol {tol:.4f}")


def check_f32_stem_compiles():
    from locov_tpu.models.resnet import ResNetStem
    x = jnp.asarray(np.random.RandomState(5)
                    .rand(1, 128, 160, 3).astype(np.float32))
    stem = ResNetStem(out_channels=64)
    p = stem.init(jax.random.PRNGKey(0), x)
    try:
        g = jax.jit(jax.grad(
            lambda pp: (stem.apply(pp, x) ** 2).sum()))(p)
        ok = bool(np.isfinite(float(
            jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b), g["params"], 0.0))))
    except Exception as e:  # noqa: BLE001 — report, don't crash
        ok = False
        check("f32 stem train path compiles on TPU", ok, repr(e)[:120])
        return
    check("f32 stem train path compiles on TPU", ok)


def check_int8_conv():
    """int8 conv lowers on TPU and matches the integer-exact host
    reference to f32-dequant rounding (the accumulation is int32 on
    both sides — any larger deviation means the MXU path changed the
    math, e.g. silently truncated the accumulator)."""
    from locov_tpu.ops.int8_conv import conv_int8
    rng = np.random.RandomState(11)
    x = rng.randn(2, 14, 14, 64).astype(np.float32)
    w = (rng.randn(3, 3, 64, 32) * rng.rand(32) ** 2).astype(np.float32)
    try:
        got = np.asarray(jax.jit(
            lambda a, b: conv_int8(a, b, 1, 1))(jnp.asarray(x),
                                                jnp.asarray(w)))
    except Exception as e:  # noqa: BLE001 — report, don't crash
        check("int8 conv lowers + exact on TPU", False, repr(e)[:160])
        return
    # host reference with the same quant scheme, exact int math
    sx = max(np.abs(x).max() / 127.0, 1e-12)
    xq = np.clip(np.round(x / sx), -127, 127).astype(np.int64)
    sw = np.maximum(np.abs(w).max(axis=(0, 1, 2)) / 127.0, 1e-12)
    wq = np.clip(np.round(w / sw), -127, 127).astype(np.int64)
    xp = np.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    want = np.zeros(got.shape, np.int64)
    for i in range(got.shape[1]):
        for j in range(got.shape[2]):
            want[:, i, j, :] = np.einsum(
                "bklc,klco->bo", xp[:, i:i + 3, j:j + 3, :], wq)
    want = want.astype(np.float32) * (sx * sw)
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    check("int8 conv lowers + exact on TPU", rel < 1e-6,
          f"max rel {rel:.2e}")


def check_serving_export():
    """VERDICT r3 Next #7: the deployment artifact proven on its target
    platform — export model.inference via jax.export ON THE TPU, reload
    the serialized program (no model Python), execute, compare to the
    live model; then the same composed with static-int8 serving."""
    import tempfile

    from locov_tpu.config import get_cfg
    from locov_tpu.models import build_meta_arch
    from locov_tpu.serving import (export_inference, load_exported,
                                   make_serve_fn)
    from locov_tpu.structures.batches import (DetectionBatch, GtBatch,
                                              ImageBatch)

    def build(int8):
        cfg = get_cfg()
        cfg.MODEL.META_ARCHITECTURE = "OvrRCNN"
        cfg.MODEL.ROI_HEADS.NUM_CLASSES = 5
        cfg.MODEL.ROI_BOX_HEAD.EMBEDDING_BASED = True
        cfg.MODEL.ROI_BOX_HEAD.EMB_DIM = 8
        cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG = True
        cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 128
        cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
        cfg.TEST.DETECTIONS_PER_IMAGE = 10
        cfg.TPU.COMPUTE_DTYPE = "bfloat16"  # production serving dtype
        if int8:
            cfg.TPU.INT8_EVAL = True
            cfg.TPU.INT8_SCHEME = "static"
        return cfg, build_meta_arch(cfg)

    rng = np.random.RandomState(0)
    b, h, w = 1, 128, 128
    image = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
    hw = jnp.asarray([[h, w]], jnp.int32)
    orig_hw = jnp.asarray([[2 * h, 2 * w]], jnp.int32)
    class_emb = jnp.asarray(rng.randn(6, 8).astype(np.float32))
    batch = DetectionBatch(
        images=ImageBatch(image=image, hw=hw, orig_hw=orig_hw),
        gt=GtBatch(boxes=jnp.zeros((b, 1, 4)),
                   classes=jnp.zeros((b, 1), jnp.int32),
                   mask=jnp.zeros((b, 1), bool)))

    for label, int8 in [("bf16", False), ("int8-static", True)]:
        cfg, model = build(int8)
        variables = jax.jit(
            lambda i, c: model.init(jax.random.PRNGKey(0),
                                    batch._replace(images=batch.images.
                                                   _replace(image=i)),
                                    c, method=model.inference)
        )(image, class_emb)
        if int8:
            # one calibration pass fills the quant collection
            _, updates = model.apply(variables, batch, class_emb,
                                     method=model.calibrate_int8,
                                     mutable=["quant"])
            variables = {**variables, "quant": updates["quant"]}
        serve = make_serve_fn(model)
        want = jax.jit(serve)(variables, image, hw, orig_hw, class_emb)
        with tempfile.TemporaryDirectory() as out:
            export_inference(model, variables, class_emb, out,
                             batch=b, height=h, width=w)
            call, v2, ce2 = load_exported(out)
            got = call(v2, image, hw, orig_hw, ce2)
        ok = True
        detail = []
        for k in ("boxes", "scores"):
            d = float(np.abs(np.asarray(got[k], np.float32)
                             - np.asarray(want[k], np.float32)).max())
            ok &= d < 1e-3
            detail.append(f"{k} maxdiff {d:.2e}")
        ok &= bool((np.asarray(got["classes"])
                    == np.asarray(want["classes"])).all())
        check(f"serving export on-device round-trip ({label})", ok,
              "; ".join(detail))



def main():
    print(f"devices: {jax.devices()}")
    check_nms_topk()
    check_batched_nms()
    check_batched_nms_compacted()
    check_pallas_pool()
    check_roi_align_precision()
    check_roi_align_int8()
    check_f32_stem_compiles()
    check_int8_conv()
    check_serving_export()
    n = len(FAILED)
    print(f"\n{'ALL CHECKS PASSED' if n == 0 else f'{n} CHECK(S) FAILED: {FAILED}'}")
    sys.exit(1 if n else 0)


if __name__ == "__main__":
    main()

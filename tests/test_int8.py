"""int8 serving path (TPU.INT8_EVAL): quantized conv exactness vs a
numpy reference of the same scheme, PTQ tolerance vs the f32 conv, and
an end-to-end inference smoke through OvrRCNN with the flag on —
including parameter-tree identity with the bf16 path (quantization is
forward-only; the checkpoint surface must not change)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from locov_tpu.ops.int8_conv import (conv_int8, quantize_per_tensor,
                                     quantize_weight_per_channel)


def _np_conv_int8(x, w, stride, pad):
    """Reference: same symmetric quant scheme, exact integer conv in
    numpy (int32 accumulation), f32 dequant."""
    sx = max(np.abs(x).max() / 127.0, 1e-12)
    xq = np.clip(np.round(x / sx), -127, 127).astype(np.int32)
    sw = np.maximum(np.abs(w).max(axis=(0, 1, 2)) / 127.0, 1e-12)
    wq = np.clip(np.round(w / sw), -127, 127).astype(np.int32)
    b, h, ww, c = x.shape
    k = w.shape[0]
    xp = np.pad(xq, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    oh = (h + 2 * pad - k) // stride + 1
    ow = (ww + 2 * pad - k) // stride + 1
    out = np.zeros((b, oh, ow, w.shape[3]), np.int64)
    for i in range(oh):
        for j in range(ow):
            patch = xp[:, i * stride:i * stride + k,
                       j * stride:j * stride + k, :]  # [b,k,k,c]
            out[:, i, j, :] = np.einsum("bklc,klco->bo", patch, wq,
                                        optimize=True)
    return out.astype(np.float32) * (sx * sw)


@pytest.mark.parametrize("kernel,stride", [(1, 1), (3, 1), (1, 2), (3, 2)])
def test_conv_int8_exact_vs_numpy(rng, kernel, stride):
    x = rng.randn(2, 8, 10, 6).astype(np.float32)
    w = rng.randn(kernel, kernel, 6, 12).astype(np.float32)
    pad = (kernel - 1) // 2
    got = np.asarray(jax.jit(
        lambda a, b: conv_int8(a, b, stride, pad))(x, w))
    want = _np_conv_int8(x, w, stride, pad)
    # integer accumulation is exact; the only float ops are the two
    # dequant multiplies, so agreement is to f32 rounding
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_conv_int8_close_to_f32(rng):
    # PTQ error budget on smooth activations: per-channel weights +
    # per-tensor activations should land within ~1-2% relative error
    x = np.abs(rng.randn(2, 14, 14, 32)).astype(np.float32)  # relu-like
    w = (rng.randn(3, 3, 32, 16) *
         rng.rand(16) ** 2).astype(np.float32)  # varied channel scales
    got = np.asarray(conv_int8(jnp.asarray(x), jnp.asarray(w), 1, 1))
    want = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    denom = np.abs(want).mean()
    assert np.abs(got - want).mean() / denom < 0.02


def test_quantizers_zero_safe():
    q, s = quantize_per_tensor(jnp.zeros((2, 3)))
    assert np.all(np.asarray(q) == 0) and np.isfinite(float(s))
    qw, sw = quantize_weight_per_channel(jnp.zeros((1, 1, 3, 4)))
    assert np.all(np.asarray(qw) == 0)
    assert np.all(np.isfinite(np.asarray(sw)))


@pytest.fixture(scope="module")
def tiny_stt():
    from locov_tpu.config import get_cfg
    from locov_tpu.models import build_meta_arch
    from locov_tpu.structures.batches import (DetectionBatch, GtBatch,
                                              ImageBatch)
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "OvrRCNN"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 5
    cfg.MODEL.ROI_BOX_HEAD.EMBEDDING_BASED = True
    cfg.MODEL.ROI_BOX_HEAD.EMB_DIM = 8
    cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG = True
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 16
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    cfg.TPU.COMPUTE_DTYPE = "float32"

    rng = np.random.RandomState(0)
    b, h, w = 2, 64, 64
    images = ImageBatch(
        image=jnp.array(rng.rand(b, h, w, 3).astype(np.float32) * 255),
        hw=jnp.array([[64, 64], [48, 56]]),
        orig_hw=jnp.array([[128, 128], [96, 112]]))
    gt = GtBatch(boxes=jnp.zeros((b, 1, 4)),
                 classes=jnp.zeros((b, 1), jnp.int32),
                 mask=jnp.zeros((b, 1), bool))
    batch = DetectionBatch(images=images, gt=gt)
    class_emb = jnp.array(rng.randn(6, 8).astype(np.float32))
    return cfg, batch, class_emb, build_meta_arch


def _tame_rpn(variables):
    """Zero the RPN anchor-delta head so proposals decode to the
    anchors themselves (valid, non-degenerate boxes). At random init
    the trunk's activations are huge (FrozenBN folds to identity) and
    the decoded proposals can ALL collapse to zero-area boxes clipped
    at the image corners — which ulp-level codegen differences across
    hosts can flip, making any `amax > 0` assertion a coin toss
    (observed: same seed, degenerate on one host, fine on another).
    Anchors-as-proposals keeps the full RPN+ROI graph in the compiled
    program while making its content deterministic."""
    import flax
    flat = flax.traverse_util.flatten_dict(variables["params"])
    for path in list(flat):
        if "anchor_deltas" in path:
            flat[path] = jnp.zeros_like(flat[path])
    params = flax.traverse_util.unflatten_dict(flat)
    return {**variables, "params": params}


def test_conv_int8_static_matches_dynamic_with_true_amax(rng):
    # with amax = the tensor's true max, the static path must produce
    # exactly the dynamic path's result (same scale, same int math)
    x = rng.randn(2, 8, 8, 6).astype(np.float32)
    w = rng.randn(3, 3, 6, 4).astype(np.float32)
    amax = jnp.asarray(np.abs(x).max(), jnp.float32)
    dyn = np.asarray(conv_int8(jnp.asarray(x), jnp.asarray(w), 1, 1))
    sta = np.asarray(conv_int8(jnp.asarray(x), jnp.asarray(w), 1, 1,
                               amax=amax))
    np.testing.assert_array_equal(dyn, sta)


@pytest.mark.slow
def test_int8_static_calibrate_flow(tiny_stt):
    """init(static) -> calibrate(mutable quant) -> inference must equal
    the dynamic scheme on the calibration batch (running maxima start
    at zero, so after one pass every static scale equals the dynamic
    one), and the quant collection must be populated."""
    cfg, batch, class_emb, build = tiny_stt
    key = jax.random.PRNGKey(0)

    cfg.TPU.INT8_EVAL = True
    cfg.TPU.INT8_SCHEME = "dynamic"
    mdyn = build(cfg)
    pdyn = _tame_rpn(mdyn.init(key, batch, class_emb,
                               method=mdyn.inference))
    dets_dyn = mdyn.apply(pdyn, batch, class_emb, method=mdyn.inference)

    cfg.TPU.INT8_SCHEME = "static"
    msta = build(cfg)
    vs = _tame_rpn(msta.init(key, batch, class_emb,
                             method=msta.inference))
    assert "quant" in vs
    _, upd = msta.apply(vs, batch, class_emb,
                        method=msta.calibrate_int8, mutable=["quant"])
    amaxes = jax.tree_util.tree_leaves(upd["quant"])
    assert all(float(a) > 0 for a in amaxes)
    vs = {**vs, **upd}
    dets_sta = msta.apply(vs, batch, class_emb, method=msta.inference)
    np.testing.assert_allclose(np.asarray(dets_sta.scores),
                               np.asarray(dets_dyn.scores),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dets_sta.boxes),
                               np.asarray(dets_dyn.boxes),
                               rtol=1e-5, atol=1e-4)
    cfg.TPU.INT8_EVAL = False  # restore for other tests
    cfg.TPU.INT8_SCHEME = "dynamic"


@pytest.mark.slow
def test_int8_calibrate_step_on_mesh(tiny_stt):
    """make_calibrate_step on the 8-device mesh: quant comes back
    replicated and accumulates a running max across calls; the merged
    params then drive make_eval_step."""
    import jax.numpy as jnp
    from locov_tpu.parallel import (get_mesh, make_calibrate_step,
                                    make_eval_step)
    cfg, batch, class_emb, build = tiny_stt
    cfg.TPU.INT8_EVAL = True
    cfg.TPU.INT8_SCHEME = "static"
    model = build(cfg)
    params = _tame_rpn(jax.jit(
        lambda d, c: model.init(jax.random.PRNGKey(0), d, c,
                                method=model.inference))(batch, class_emb))
    mesh = get_mesh(jax.devices()[:2])  # fixture batch is 2
    cal = make_calibrate_step(model, mesh)
    quant = cal(params, batch, class_emb)
    amaxes1 = [float(a) for a in jax.tree_util.tree_leaves(quant)]
    assert all(a > 0 for a in amaxes1)
    params = {**params, "quant": quant}
    # second pass with a brighter batch must only move maxima UP
    batch2 = batch._replace(images=batch.images._replace(
        image=batch.images.image * 2.0))
    quant2 = cal(params, batch2, class_emb)
    amaxes2 = [float(a) for a in jax.tree_util.tree_leaves(quant2)]
    assert all(b >= a for a, b in zip(amaxes1, amaxes2))
    params = {**params, "quant": quant2}
    dets = make_eval_step(model, mesh)(params, batch, class_emb)
    assert np.all(np.isfinite(np.asarray(dets.scores)))
    cfg.TPU.INT8_EVAL = False
    cfg.TPU.INT8_SCHEME = "dynamic"


@pytest.mark.slow
def test_int8_eval_end_to_end(tiny_stt):
    cfg, batch, class_emb, build = tiny_stt
    key = jax.random.PRNGKey(0)

    model = build(cfg)
    params = _tame_rpn(model.init(key, batch, class_emb,
                                  method=model.inference))

    cfg.TPU.INT8_EVAL = True
    model8 = build(cfg)
    # same param tree: quantization is forward-only, checkpoints load
    # unchanged
    params8 = _tame_rpn(model8.init(key, batch, class_emb,
                                    method=model8.inference))
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params8)

    dets = jax.jit(lambda p, b, c: model8.apply(
        p, b, c, method=model8.inference))(params, batch, class_emb)
    assert np.all(np.isfinite(np.asarray(dets.scores)))
    assert np.all(np.isfinite(np.asarray(dets.boxes)))

"""Serving export (locov_tpu/serving.py): the jitted inference step
serialized via jax.export must round-trip — deserialize in a consumer
that never touches the model's Python code and reproduce
model.apply(...) exactly — and the artifact set must be complete.

The reference has no serving/export surface (deploying it = shipping
the torch training repo); this is a TPU-native extension.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from locov_tpu.config import get_cfg
from locov_tpu.models import build_meta_arch
from locov_tpu.serving import export_inference, load_exported, \
    make_serve_fn
from locov_tpu.structures.batches import DetectionBatch, GtBatch, \
    ImageBatch


@pytest.fixture(scope="module")
def tiny_export(tmp_path_factory):
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
    model = build_meta_arch(cfg)

    rng = np.random.RandomState(0)
    b, h, w = 2, 64, 64
    image = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
    hw = jnp.asarray([[64, 64], [48, 56]], jnp.int32)
    orig_hw = jnp.asarray([[128, 128], [96, 112]], jnp.int32)
    class_emb = jnp.asarray(rng.randn(6, 8).astype(np.float32))

    variables = jax.jit(
        lambda i, c: model.init(
            jax.random.PRNGKey(0),
            DetectionBatch(
                images=ImageBatch(image=i, hw=hw, orig_hw=orig_hw),
                gt=GtBatch(boxes=jnp.zeros((b, 1, 4)),
                           classes=jnp.zeros((b, 1), jnp.int32),
                           mask=jnp.zeros((b, 1), bool))),
            c, method=model.inference))(image, class_emb)

    out = str(tmp_path_factory.mktemp("export"))
    art = export_inference(model, variables, class_emb, out,
                           batch=b, height=h, width=w)
    return (model, variables, image, hw, orig_hw, class_emb, out, art)


def test_export_artifacts_complete(tiny_export):
    *_, out, art = tiny_export
    assert os.path.isfile(art)
    mlir = open(os.path.join(out, "inference.stablehlo.mlir")).read()
    assert "stablehlo" in mlir or "module" in mlir
    sig = json.load(open(os.path.join(out, "signature.json")))
    assert sig["inputs"]["image"]["shape"] == [2, 64, 64, 3]
    assert set(sig["outputs"]) == {"boxes", "scores", "classes", "mask"}
    assert os.path.isdir(os.path.join(out, "params"))


def test_exported_program_matches_model_apply(tiny_export):
    model, variables, image, hw, orig_hw, class_emb, out, _ = tiny_export
    call, v2, ce2 = load_exported(out)
    got = call(v2, image, hw, orig_hw, ce2)
    serve = make_serve_fn(model)
    want = serve(variables, image, hw, orig_hw, class_emb)
    for k in ("boxes", "scores"):
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(want[k]),
                                   rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got["classes"]),
                                  np.asarray(want["classes"]))
    np.testing.assert_array_equal(np.asarray(got["mask"]),
                                  np.asarray(want["mask"]))


def test_sharded_export_multichip_serving(tiny_export, tmp_path):
    """GSPMD serving export: the same inference program exported over an
    8-device mesh (batch split over the data axis, weights replicated)
    must round-trip and agree with the single-device artifact."""
    model, variables, image, hw, orig_hw, class_emb, out, _ = tiny_export
    from jax.sharding import NamedSharding, PartitionSpec as P

    from locov_tpu.parallel import get_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = get_mesh(jax.devices()[:8])

    # batch 2 doesn't divide 8 — replicate the two images to batch 8
    reps = 4
    image8 = jnp.tile(image, (reps, 1, 1, 1))
    hw8, orig8 = jnp.tile(hw, (reps, 1)), jnp.tile(orig_hw, (reps, 1))

    sharded_dir = str(tmp_path / "sharded")
    export_inference(model, variables, class_emb, sharded_dir,
                     batch=8, height=64, width=64, mesh=mesh)

    sig = json.load(open(os.path.join(sharded_dir, "signature.json")))
    assert sig["nr_devices"] == 8
    assert sig["mesh"]["shape"] == [8]

    call, v2, ce2 = load_exported(sharded_dir)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(mesh.axis_names[0]))
    got = call(jax.device_put(v2, repl),
               jax.device_put(image8, data),
               jax.device_put(hw8, data),
               jax.device_put(orig8, data),
               jax.device_put(ce2, repl))

    serve = make_serve_fn(model)
    want = serve(variables, image8, hw8, orig8, class_emb)
    for k in ("boxes", "scores"):
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(want[k]),
                                   rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got["classes"]),
                                  np.asarray(want["classes"]))

    # batch must divide the mesh
    with pytest.raises(ValueError):
        export_inference(model, variables, class_emb,
                         str(tmp_path / "bad"), batch=6, height=64,
                         width=64, mesh=mesh)


def test_exported_program_rejects_wrong_shapes(tiny_export):
    _, _, image, hw, orig_hw, _, out, _ = tiny_export
    call, v2, ce2 = load_exported(out)
    bad = jnp.zeros((2, 32, 32, 3), jnp.float32)  # wrong H, W
    with pytest.raises(Exception):
        jax.jit(call)(v2, bad, hw, orig_hw, ce2)

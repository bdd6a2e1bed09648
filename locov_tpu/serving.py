"""AOT serving export: the detection inference step as a portable,
self-contained XLA artifact.

The reference has no deployment story — "inference" means installing
the full training repo (torch + detectron2 + its CUDA ops) and running
the eval loop (ovr/evaluation/evaluator.py). On TPU the natural
serving artifact is the *exported program*: the jitted inference
function lowered to StableHLO together with its calling convention,
serialized via ``jax.export`` to bytes that a later process — a
Python host, a C++ PJRT server, an IFRT proxy — can deserialize and
execute WITHOUT any of the model's Python code. Weights ride alongside
as a plain orbax checkpoint.

Artifact layout written by :func:`export_inference`:

    <out>/inference.jaxexport       serialized jax.export.Exported
    <out>/inference.stablehlo.mlir  human-readable StableHLO text
    <out>/params/                   orbax checkpoint of the variables
    <out>/signature.json            input/output shapes + dtypes

The exported function takes plain arrays only (no framework pytrees):
``(variables, image[B,H,W,3]f32, hw[B,2]i32, orig_hw[B,2]i32,
class_emb[C+1,D]f32)`` and returns a dict of ``boxes [B,K,4]`` (in
original-image coordinates), ``scores [B,K]``, ``classes [B,K]i32``,
``mask [B,K]bool`` — the Detections fields. Image preprocessing
(PIXEL_MEAN/STD, BGR order, bucket padding) happens inside the model's
own preprocess, identically to training/eval.

``TPU.INT8_EVAL`` composes: export after calibration and the ``quant``
collection (static activation scales) is baked into the artifact.
"""
from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .structures.batches import DetectionBatch, GtBatch, ImageBatch


def load_class_embeddings(path: str):
    """Read a class-name->vector JSON (tools/coco_bert_embeddings.py
    output) into ``(names, mtx)`` with the framework's row convention:
    row i = names[i] (sorted), and the LAST row is the zero background
    embedding (data/datasets/coco.py:219-222; the classifier's scores
    are [.., K+1] with K = background, models/box_predictor.py)."""
    with open(path) as f:
        emb = json.load(f)
    names = sorted(emb)
    dim = len(emb[names[0]])
    mtx = np.zeros((len(names) + 1, dim), np.float32)
    for i, k in enumerate(names):
        mtx[i] = np.asarray(emb[k], np.float32)
    return names, jnp.asarray(mtx)


def make_serve_fn(model):
    """Wrap ``model.inference`` as a plain-array function suitable for
    jax.export (exported calling conventions should not depend on the
    framework's registered pytree nodes)."""

    def serve(variables, image, hw, orig_hw, class_emb):
        b = image.shape[0]
        batch = DetectionBatch(
            images=ImageBatch(image=image, hw=hw, orig_hw=orig_hw),
            gt=GtBatch(boxes=jnp.zeros((b, 1, 4), jnp.float32),
                       classes=jnp.zeros((b, 1), jnp.int32),
                       mask=jnp.zeros((b, 1), bool)))
        dets = model.apply(variables, batch, class_emb,
                           method=model.inference)
        return {"boxes": dets.boxes, "scores": dets.scores,
                "classes": dets.classes, "mask": dets.mask}

    return serve


def _sig(tree):
    return jax.tree.map(
        lambda x: {"shape": list(np.shape(x)),
                   "dtype": str(jnp.result_type(x))}, tree)


def export_inference(model, variables, class_emb, out_dir: str,
                     batch: int, height: int, width: int,
                     platform: Optional[str] = None, mesh=None) -> str:
    """Export ``model.inference`` at static serving shapes.

    Returns the path of the serialized ``.jaxexport`` artifact. The
    artifact is lowered for ``platform`` (default: the current default
    backend), independent of where this exporter runs — exporting a TPU
    serving binary from a CPU host works.

    With ``mesh`` (a ``jax.sharding.Mesh``), the program is exported
    GSPMD-sharded for multi-chip serving: the image batch is split over
    the mesh's first axis, weights replicated, and XLA plants the
    collectives. The artifact then targets exactly ``mesh.size``
    devices — the consumer calls it under the same-shaped mesh
    (``load_exported`` returns the callable; inputs may be passed as
    ordinary host arrays and are committed per the recorded shardings).
    ``batch`` must divide evenly by ``mesh.size``.
    """
    serve = make_serve_fn(model)
    args = (
        variables,
        jax.ShapeDtypeStruct((batch, height, width, 3), jnp.float32),
        jax.ShapeDtypeStruct((batch, 2), jnp.int32),
        jax.ShapeDtypeStruct((batch, 2), jnp.int32),
        jax.ShapeDtypeStruct(np.shape(class_emb), jnp.float32),
    )
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        if batch % mesh.size:
            raise ValueError(
                f"serving batch {batch} must divide mesh size {mesh.size}")
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(mesh.axis_names[0]))
        fn = jax.jit(
            serve,
            in_shardings=(jax.tree.map(lambda _: repl, variables),
                          data, data, data, repl),
            out_shardings={"boxes": data, "scores": data,
                           "classes": data, "mask": data})
    else:
        fn = jax.jit(serve)
    platforms = [platform] if platform else None
    exported = jax.export.export(fn, platforms=platforms)(*args)

    os.makedirs(out_dir, exist_ok=True)
    art = os.path.join(out_dir, "inference.jaxexport")
    with open(art, "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(out_dir, "inference.stablehlo.mlir"), "w") as f:
        f.write(exported.mlir_module())

    from .utils.checkpoint import Checkpointer
    ck = Checkpointer(out_dir, use_async=False)
    ck.save_named("params", {"variables": variables,
                             "class_emb": class_emb})

    out_sig = jax.eval_shape(serve, variables,
                             *[jnp.zeros(a.shape, a.dtype)
                               for a in args[1:]])
    with open(os.path.join(out_dir, "signature.json"), "w") as f:
        json.dump({
            "inputs": {"image": _sig(args[1]), "hw": _sig(args[2]),
                       "orig_hw": _sig(args[3]),
                       "class_emb": _sig(args[4])},
            "outputs": _sig(out_sig),
            "platforms": list(exported.platforms),
            "nr_devices": exported.nr_devices,
            "mesh": (None if mesh is None else
                     {"axis_names": list(mesh.axis_names),
                      "shape": list(mesh.devices.shape)}),
        }, f, indent=2)
    return art


def load_exported(out_dir: str):
    """Reload a serving artifact: (callable, variables, class_emb).

    The callable is the deserialized exported program — running it does
    NOT touch the model's Python code."""
    with open(os.path.join(out_dir, "inference.jaxexport"), "rb") as f:
        exported = jax.export.deserialize(f.read())
    from .utils.checkpoint import Checkpointer
    ck = Checkpointer(out_dir, use_async=False)
    state = ck.load("params")
    variables = jax.tree.map(jnp.asarray, state["variables"])
    class_emb = jnp.asarray(state["class_emb"])
    return exported.call, variables, class_emb

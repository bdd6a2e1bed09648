#!/usr/bin/env python
"""Export the detection inference step as a serving artifact.

Packages ``OvrRCNN.inference`` (or any meta-arch exposing
``inference``) as a serialized, self-contained XLA program
(jax.export StableHLO artifact + orbax weights) — see
``locov_tpu/serving.py``. The reference has no equivalent: deploying
it means shipping the training repo. A deserialized artifact runs with
zero model Python code, on any host with a matching XLA backend.

Usage:
  python tools/export_serving.py --config-file configs/coco_stt.yaml \
      --weights output/locov/stt/model_final \
      --embeddings datasets_data/embeddings/coco_nouns_bertemb.json \
      --out exported/stt_serving --batch 8 --height 800 --width 1344 \
      [--platform tpu] [opts KEY VALUE ...]

Omit --weights to export with random init (shape/compile validation).
``--platform`` lowers for a specific backend (e.g. export a TPU
artifact from a CPU host); default is the current backend. For int8
serving, set ``TPU.INT8_EVAL True TPU.INT8_SCHEME static`` in opts and
point --weights at a checkpoint whose ``quant`` calibration collection
is populated (OVRTrainer writes it after auto-calibration).
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-file", required=True)
    p.add_argument("--weights", default="",
                   help="orbax checkpoint dir or torch .pth/.pkl "
                        "(defaults to random init)")
    p.add_argument("--embeddings", default="",
                   help="class-embedding JSON (name -> vector); "
                        "random embeddings if omitted")
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--height", type=int, default=800)
    p.add_argument("--width", type=int, default=1344)
    p.add_argument("--platform", default=None,
                   help="lowering platform (tpu/cpu/cuda); default = "
                        "current backend")
    p.add_argument("opts", nargs="*", default=[])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from locov_tpu.config import get_cfg
    from locov_tpu.models import build_meta_arch
    from locov_tpu.serving import export_inference

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    model = build_meta_arch(cfg)

    nc = cfg.MODEL.ROI_HEADS.NUM_CLASSES
    dim = cfg.MODEL.ROI_BOX_HEAD.EMB_DIM
    if args.embeddings:
        import json as _json
        with open(args.embeddings) as f:
            emb = _json.load(f)
        mat = np.zeros((len(emb) + 1, dim), np.float32)  # zero bg row
        for i, k in enumerate(sorted(emb)):
            mat[i + 1] = np.asarray(emb[k], np.float32)
        class_emb = jnp.asarray(mat)
    else:
        class_emb = jnp.asarray(
            np.random.RandomState(0).randn(nc + 1, dim)
            .astype(np.float32))

    ex_image = jnp.zeros((args.batch, args.height, args.width, 3),
                         jnp.float32)
    ex_hw = jnp.full((args.batch, 2), args.height, jnp.int32)
    # init at serving shapes so inference-only collections (e.g. the
    # int8 'quant' calibration maxima) are created too; jitted because
    # eager init through the device tunnel is pathological
    variables = jax.jit(
        lambda img, hw, ce: _init(model, img, hw, ce))(
            ex_image, ex_hw, class_emb)

    if args.weights:
        variables = _load_weights(cfg, variables, args.weights,
                                  args.out)

    art = export_inference(model, variables, class_emb, args.out,
                           args.batch, args.height, args.width,
                           platform=args.platform)
    print(f"exported: {art}")


def _dummy_batch(image, hw):
    from locov_tpu.structures.batches import (DetectionBatch, GtBatch,
                                              ImageBatch)
    import jax.numpy as jnp
    b = image.shape[0]
    return DetectionBatch(
        images=ImageBatch(image=image, hw=hw, orig_hw=hw),
        gt=GtBatch(boxes=jnp.zeros((b, 1, 4), jnp.float32),
                   classes=jnp.zeros((b, 1), jnp.int32),
                   mask=jnp.zeros((b, 1), bool)))


def _init(model, image, hw, class_emb):
    import jax
    return model.init(jax.random.PRNGKey(0), _dummy_batch(image, hw),
                      class_emb, method=model.inference)


def _load_weights(cfg, variables, weights, out_dir):
    """Mirror OVRTrainer.load_pretrained for a standalone export
    (engine/trainer.py:load_pretrained), including the LSM->STT rename
    fan-out, without building loaders/datasets."""
    import json

    import jax
    import jax.numpy as jnp

    from locov_tpu.utils.checkpoint import (Checkpointer,
                                            STT_FROM_LSM_RENAME,
                                            convert_caffe2_resnet,
                                            convert_d2_state_dict,
                                            flatten_params,
                                            load_torch_file,
                                            load_with_rename_map,
                                            unflatten_params)

    flat_dst = flatten_params(variables["params"])
    if weights.endswith((".pth", ".pkl")):
        state = load_torch_file(weights)
        flat_src = convert_caffe2_resnet(state) \
            if weights.endswith(".pkl") else convert_d2_state_dict(state)
        extra = {}
    else:
        ck = Checkpointer(os.path.dirname(weights) or ".",
                          use_async=False)
        state = ck.load(weights)
        src = state["params"] if "params" in state else state
        if "params" in src:
            src, extra = src["params"], {k: v for k, v in src.items()
                                         if k != "params"}
        else:
            extra = {}
        flat_src = flatten_params(src)
    same = set(flat_src) == set(flat_dst)
    rename = {} if same else STT_FROM_LSM_RENAME
    merged, report = load_with_rename_map(flat_src, flat_dst, rename)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "import_report.json"), "w") as f:
        json.dump({"weights": weights, "loaded": report.loaded,
                   "missing": report.missing,
                   "mismatched": [list(m) for m in report.mismatched],
                   "unused_src": report.unused_src}, f, indent=1)
    print(report.summary())
    out = dict(variables)
    out["params"] = jax.tree.map(jnp.asarray, unflatten_params(merged))
    # carry calibration collections (int8 'quant') if present
    for k, v in (extra or {}).items():
        if k in out:
            out[k] = jax.tree.map(jnp.asarray, v)
    return out


if __name__ == "__main__":
    main()

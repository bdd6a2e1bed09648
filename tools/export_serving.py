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
    p.add_argument("--n-devices", type=int, default=1,
                   help="export a GSPMD-sharded program for N-chip "
                        "serving (batch split over a 1D data mesh, "
                        "weights replicated); needs N visible devices "
                        "at export time and targets exactly N at call "
                        "time")
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
        from locov_tpu.serving import load_class_embeddings
        _, class_emb = load_class_embeddings(args.embeddings)
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
        from locov_tpu.utils.checkpoint import load_weights_standalone
        variables = load_weights_standalone(variables, args.weights,
                                            report_dir=args.out)

    mesh = None
    if args.n_devices > 1:
        from locov_tpu.parallel import get_mesh
        assert len(jax.devices()) >= args.n_devices, (
            f"--n-devices {args.n_devices} but only "
            f"{len(jax.devices())} devices visible")
        mesh = get_mesh(jax.devices()[:args.n_devices])

    art = export_inference(model, variables, class_emb, args.out,
                           args.batch, args.height, args.width,
                           platform=args.platform, mesh=mesh)
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


if __name__ == "__main__":
    main()

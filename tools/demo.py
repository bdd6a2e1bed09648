#!/usr/bin/env python
"""Run open-vocabulary detection on image files and visualize it.

The reference repo has no demo surface (its Detectron2 parent does —
`demo/demo.py`); deploying LocOV on a single image means writing a
script against the training internals. This tool is that script: cfg +
weights + class-name embeddings -> drawn detections, using the exact
eval-time preprocessing (resize-shortest-edge into the static test
bucket, the same bucket set the evaluator compiles for).

Usage:
  python tools/demo.py --config-file configs/coco_stt.yaml \
      --weights output/locov/stt/model_final \
      --embeddings datasets_data/embeddings/coco_nouns_bertemb.json \
      --input img1.jpg img2.jpg --output demo_out \
      [--confidence-threshold 0.5] [opts KEY VALUE ...]

Writes `<output>/<name>.jpg` (boxes + class + score burned in) and
`<output>/<name>.json` (the raw detections) per input. Omit --weights
for a random-init smoke run; omit --embeddings to label classes by
index. Open-vocabulary by construction: point --embeddings at ANY
class-name->vector JSON (tools/coco_bert_embeddings.py builds one from
arbitrary nouns) and the frozen detector classifies against it — no
retraining, exactly the reference's novel-class mechanism.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-file", required=True)
    p.add_argument("--weights", default="")
    p.add_argument("--embeddings", default="",
                   help="class-name -> vector JSON; classes labeled by "
                        "index if omitted")
    p.add_argument("--input", nargs="+", required=True,
                   help="image file paths")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--confidence-threshold", type=float, default=0.5)
    p.add_argument("opts", nargs="*", default=[])
    return p.parse_args()


def draw(image_bgr: np.ndarray, dets: list) -> np.ndarray:
    """Burn boxes/labels into a BGR uint8 image (cv2, PIL fallback)."""
    try:
        import cv2
        out = image_bgr.copy()
        for d in dets:
            x0, y0, x1, y1 = [int(round(v)) for v in d["bbox_xyxy"]]
            color = COLORS[d["class_index"] % len(COLORS)]
            cv2.rectangle(out, (x0, y0), (x1, y1), color, 2)
            label = f"{d['class_name']} {d['score']:.2f}"
            (tw, th), base = cv2.getTextSize(
                label, cv2.FONT_HERSHEY_SIMPLEX, 0.5, 1)
            ty = y0 - 4 if y0 - th - base - 4 >= 0 else y1 + th + base + 4
            cv2.rectangle(out, (x0, ty - th - base), (x0 + tw, ty + base),
                          color, -1)
            cv2.putText(out, label, (x0, ty), cv2.FONT_HERSHEY_SIMPLEX,
                        0.5, (255, 255, 255), 1, cv2.LINE_AA)
        return out
    except ImportError:
        from PIL import Image, ImageDraw
        im = Image.fromarray(image_bgr[:, :, ::-1])
        dr = ImageDraw.Draw(im)
        for d in dets:
            color = tuple(COLORS[d["class_index"] % len(COLORS)][::-1])
            dr.rectangle(d["bbox_xyxy"], outline=color, width=2)
            dr.text((d["bbox_xyxy"][0], max(0, d["bbox_xyxy"][1] - 12)),
                    f"{d['class_name']} {d['score']:.2f}", fill=color)
        return np.asarray(im)[:, :, ::-1]


# BGR palette (distinct hues, dark enough for white label text)
COLORS = [(180, 119, 31), (14, 127, 255), (44, 160, 44), (40, 39, 214),
          (189, 103, 148), (75, 86, 140), (194, 119, 227), (127, 127, 127),
          (34, 189, 188), (207, 190, 23)]


def main():
    args = parse_args()

    import jax
    import jax.numpy as jnp

    from locov_tpu.config import get_cfg
    from locov_tpu.data import transforms as Tr
    from locov_tpu.data.loader import _pad_image, _pick_bucket, \
        derive_buckets
    from locov_tpu.data.mappers import read_image
    from locov_tpu.models import build_meta_arch
    from locov_tpu.structures.batches import DetectionBatch, GtBatch, \
        ImageBatch

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.MODEL.WEIGHTS = ""  # loaded explicitly below
    model = build_meta_arch(cfg)

    if args.embeddings:
        from locov_tpu.serving import load_class_embeddings
        names, class_emb = load_class_embeddings(args.embeddings)
    else:
        nc = cfg.MODEL.ROI_HEADS.NUM_CLASSES
        dim = cfg.MODEL.ROI_BOX_HEAD.EMB_DIM
        names = [f"class_{i}" for i in range(nc)]
        class_emb = jnp.asarray(
            np.random.RandomState(0).randn(nc + 1, dim)
            .astype(np.float32))

    buckets = derive_buckets(cfg, is_train=False)
    os.makedirs(args.output, exist_ok=True)

    def make_batch(image_f32, hw, orig_hw):
        return DetectionBatch(
            images=ImageBatch(
                image=image_f32[None], hw=jnp.asarray(hw, jnp.int32)[None],
                orig_hw=jnp.asarray(orig_hw, jnp.int32)[None]),
            gt=GtBatch(boxes=jnp.zeros((1, 1, 4), jnp.float32),
                       classes=jnp.zeros((1, 1), jnp.int32),
                       mask=jnp.zeros((1, 1), bool)))

    infer = jax.jit(lambda v, b, c: model.apply(v, b, c,
                                                method=model.inference))
    variables = None

    for path in args.input:
        img = read_image(path, cfg.INPUT.FORMAT)  # BGR uint8
        oh, ow = img.shape[:2]
        resized, _ = Tr.resize_shortest_edge(
            img, cfg.INPUT.MIN_SIZE_TEST, cfg.INPUT.MAX_SIZE_TEST)
        nh, nw = resized.shape[:2]
        bucket = _pick_bucket((nh, nw), buckets)
        padded = jnp.asarray(
            _pad_image(resized, bucket).astype(np.float32))
        batch = make_batch(padded, (nh, nw), (oh, ow))

        if variables is None:
            variables = jax.jit(
                lambda b, c: model.init(jax.random.PRNGKey(0), b, c,
                                        method=model.inference))(
                batch, class_emb)
            if args.weights:
                from locov_tpu.utils.checkpoint import \
                    load_weights_standalone
                variables = load_weights_standalone(
                    variables, args.weights, report_dir=args.output)

        d = infer(variables, batch, class_emb)
        boxes = np.asarray(d.boxes[0])
        scores = np.asarray(d.scores[0])
        classes = np.asarray(d.classes[0])
        mask = np.asarray(d.mask[0])
        keep = mask & (scores >= args.confidence_threshold)
        dets = [{
            "bbox_xyxy": [float(v) for v in boxes[i]],
            "score": float(scores[i]),
            "class_index": int(classes[i]),
            "class_name": (names[int(classes[i])]
                           if int(classes[i]) < len(names)
                           else f"class_{int(classes[i])}"),
        } for i in np.nonzero(keep)[0]]

        stem = os.path.splitext(os.path.basename(path))[0]
        with open(os.path.join(args.output, stem + ".json"), "w") as f:
            json.dump({"file": path, "detections": dets}, f, indent=1)
        vis = draw(img, dets)
        out_img = os.path.join(args.output, stem + ".jpg")
        try:
            import cv2
            cv2.imwrite(out_img, vis)
        except ImportError:
            from PIL import Image
            Image.fromarray(vis[:, :, ::-1]).save(out_img)
        print(f"{path}: {len(dets)} detections >= "
              f"{args.confidence_threshold} -> {out_img}")


if __name__ == "__main__":
    main()

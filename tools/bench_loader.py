#!/usr/bin/env python
"""Host input-pipeline benchmark: sustained mapper+collate throughput
on REAL-SIZED JPEGs (generated locally), vs the device's training
consumption rate.

The training step consumes ~33 img/s/chip at LSM shapes (PERF.md); the
loader must sustain >= 2x that per host so decode never starves the
device. This tool measures the full host path the trainer runs:
JPEG decode -> resize-shortest-edge(800/1333) -> flip -> box transform
-> caption choice -> tokenize + MLM mask -> bucket-group -> static
collate, through ``DetectionMapper`` + ``DataLoader`` exactly as
``OVRTrainer.build_train_loader`` wires them.

Usage: python tools/bench_loader.py [--images 256] [--batch 4]
       [--seconds 12] [--workers 0 4 8]
Prints one line per worker count plus a JSON summary.
"""
import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def make_dataset(root: str, n_images: int, seed: int = 0):
    """Write n JPEGs at COCO-typical sizes with synthetic annotations,
    captions and OLN-style proposals."""
    from PIL import Image
    rng = np.random.RandomState(seed)
    records = []
    captions = {}
    proposals = {}
    sizes = [(640, 480), (640, 427), (500, 375), (612, 612), (640, 640)]
    for i in range(n_images):
        w, h = sizes[i % len(sizes)]
        # realistic JPEG entropy: smooth gradients + noise compresses
        # like a photo, unlike pure noise (worst case) or flat (best)
        yy, xx = np.mgrid[0:h, 0:w]
        base = (np.sin(xx / 37.0) * 60 + np.cos(yy / 23.0) * 60 + 128)
        img = np.clip(base[..., None] + rng.randn(h, w, 3) * 18, 0,
                      255).astype(np.uint8)
        path = os.path.join(root, f"{i:06d}.jpg")
        Image.fromarray(img).save(path, quality=90)
        nb = rng.randint(2, 12)
        xy = rng.rand(nb, 2) * [w * 0.7, h * 0.7]
        wh2 = rng.rand(nb, 2) * [w * 0.3, h * 0.3] + 8
        anns = [{"bbox": [float(x), float(y), float(x + bw),
                          float(y + bh)],
                 "category_id": int(rng.randint(0, 48)), "iscrowd": 0}
                for (x, y), (bw, bh) in zip(xy, wh2)]
        records.append({"file_name": path, "image_id": i, "height": h,
                        "width": w, "annotations": anns})
        captions[i] = [f"a photo of thing {i} doing something"]
        pb = np.concatenate([xy, xy + wh2], 1).astype(np.float32)
        proposals[i] = np.concatenate(
            [pb, rng.rand(nb, 1).astype(np.float32) * 0.3 + 0.7], 1)
    return records, captions, proposals


def build_loader(records, captions, proposals, batch, workers,
                 backend="threads"):
    from locov_tpu.config import config_path, get_cfg
    from locov_tpu.data.loader import (DataLoader, TrainingSampler,
                                       derive_buckets)
    from locov_tpu.data.mappers import DetectionMapper
    from locov_tpu.data.tokenization import (WordPieceTokenizer,
                                             build_tiny_vocab)

    cfg = get_cfg()
    cfg.merge_from_file(config_path("coco_lsm.yaml"))
    metadata = {
        "thing_classes": [f"c{i}" for i in range(48)],
        "captions_dict": captions,
        "object_proposals": proposals,
    }
    tok = WordPieceTokenizer(build_tiny_vocab(
        "a photo of thing doing something".split()))
    mapper = DetectionMapper(cfg, metadata, is_train=True, tokenizer=tok,
                             mlm=True)
    sampler = TrainingSampler(len(records), shuffle=True, seed=1)
    return DataLoader(records, mapper, sampler, batch,
                      derive_buckets(cfg, True),
                      gt_slots=cfg.TPU.MAX_GT_BOXES, has_text=True,
                      is_train=True, num_workers=workers,
                      worker_backend=backend)


def measure(loader, batch, seconds):
    it = iter(loader)
    next(it)  # warm caches
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < seconds:
        next(it)
        n += batch
    return n / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=256)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=12.0)
    ap.add_argument("--workers", type=int, nargs="+", default=[0, 4, 8])
    ap.add_argument("--device-rate", type=float, default=33.1,
                    help="img/s the device consumes (PERF.md)")
    ap.add_argument("--backend", default="threads",
                    choices=["threads", "processes"],
                    help="DATALOADER.WORKER_BACKEND to benchmark")
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as root:
        print(f"generating {args.images} jpegs...", file=sys.stderr)
        records, captions, proposals = make_dataset(root, args.images)
        results = {}
        for w in args.workers:
            loader = build_loader(records, captions, proposals,
                                  args.batch, w,
                                  backend=args.backend if w else "threads")
            ips = measure(loader, args.batch, args.seconds)
            results[w] = round(ips, 1)
            print(f"workers={w}: {ips:.1f} img/s "
                  f"({ips / args.device_rate:.2f}x device rate)",
                  file=sys.stderr)
        best = max(results.values())
        print(json.dumps({
            "metric": "loader_images_per_sec",
            "value": best,
            "unit": "img/s",
            "vs_baseline": round(best / args.device_rate, 3),
            "per_workers": results,
        }))


if __name__ == "__main__":
    main()

"""Evaluation orchestration.

Port of ``ovr/evaluation/evaluator.py``: evaluator selection by
meta-arch/dataset (``select_and_build_evaluator``, :25-67), dispatch by
evaluation type (:70-96), and the loss-only caption-eval loop with
warmup-aware timing (``inference_on_caption_ovr_dataset``, :99-196).
Detection eval runs the jitted inference step over a static loader and
feeds per-image detections into the from-scratch COCO evaluator; padded
images (image_id == -1) are dropped. Also reproduces the reference's
seen/unseen mean-AP50 summary (custom_coco_eval.py:96-137).
"""
from __future__ import annotations

import datetime
import logging
import time
from typing import Dict, Tuple

import jax
import numpy as np

from ..data.catalog import MetadataCatalog
from .coco_eval import COCOEvaluatorTPU

logger = logging.getLogger(__name__)

GRID_ARCHS = {"MMSSGridModel", "DistillMMSSGridModel",
              "DistillMMSSMixTokensGridModel",
              "HierarchicalDistillMMSSGridModel"}
LOSS_AND_DET_ARCHS = {"DistillProposalMMSSRCNN",
                      "DistillProposalMMSSMixTokensRCNN",
                      "DistillOnlyProposalMMSSRCNN",
                      "HierarchicalDistillProposalMMSSRCNN"}


def build_coco_evaluator(dataset_name: str) -> COCOEvaluatorTPU:
    """Build the COCO evaluator from a registered dataset's gt."""
    from ..data.catalog import DatasetCatalog
    records = DatasetCatalog.get(dataset_name)
    meta = MetadataCatalog.get(dataset_name)
    id_map = meta.thing_dataset_id_to_contiguous_id
    inv = {v: k for k, v in id_map.items()}
    gts = []
    for r in records:
        for a in r["annotations"]:
            gts.append({
                "image_id": r["image_id"],
                "category_id": inv[a["category_id"]],
                "bbox": a["bbox"], "area": a["area"],
                "iscrowd": a.get("iscrowd", 0),
            })
    cat_ids = [inv[i] for i in range(len(meta.thing_classes))]
    return COCOEvaluatorTPU(gts, [r["image_id"] for r in records],
                            cat_ids, list(meta.thing_classes))


def select_evaluator_type(cfg, dataset_name: str) -> str:
    """Reference selection logic (evaluator.py:25-67)."""
    if cfg.MODEL.META_ARCHITECTURE in GRID_ARCHS:
        return "ovr"
    etype = "lvis" if "lvis" in dataset_name else "coco"
    if cfg.MODEL.META_ARCHITECTURE in LOSS_AND_DET_ARCHS:
        etype = "loss_and_" + etype
    return etype


def gather_host_detections(arrays: Dict[str, np.ndarray]
                           ) -> Dict[str, np.ndarray]:
    """Concatenate per-host detection arrays across JAX processes.

    The reference merges predictions with ``comm.gather`` inside d2's
    ``inference_on_dataset`` (SURVEY §3.3); here every host
    all-gathers the others' rows (pad-to-max then trim, since
    ``process_allgather`` needs equal shapes) so each host computes
    identical global metrics. Single-process: identity."""
    if jax.process_count() == 1:
        return arrays
    from jax.experimental import multihost_utils as mhu
    n_local = len(next(iter(arrays.values())))
    counts = np.asarray(mhu.process_allgather(
        np.asarray([n_local], np.int64))).reshape(-1)
    n_max = int(counts.max())
    out = {}
    for k, v in arrays.items():
        pad_shape = (n_max - n_local,) + v.shape[1:]
        padded = np.concatenate(
            [v, np.zeros(pad_shape, v.dtype)]) if n_max > n_local else v
        gathered = np.asarray(mhu.process_allgather(padded))
        gathered = gathered.reshape((len(counts), n_max) + v.shape[1:])
        out[k] = np.concatenate(
            [gathered[h, :counts[h]] for h in range(len(counts))])
    return out


def collect_detections(eval_step, params, loader, class_emb,
                       inv: np.ndarray, mirror_x: bool = False):
    """Run the jitted inference step over a loader and return flat
    per-detection arrays {img, box, score, cls} (dataset-id classes)
    plus (n_timed, timing_start). mirror_x flips boxes back to the
    unflipped frame (TTA)."""
    total = len(loader)
    num_warmup = min(5, total - 1)
    start = time.perf_counter()
    n_timed = 0
    d_imgs, d_boxes, d_scores, d_classes = [], [], [], []
    for idx, batch in enumerate(loader):
        dets = eval_step(params, batch, class_emb)
        dets = jax.tree.map(np.asarray, jax.device_get(dets))
        ids = np.asarray(batch.images.image_id)
        orig_hw = np.asarray(batch.images.orig_hw) if mirror_x else None
        for i, img_id in enumerate(ids):
            if img_id < 0:
                continue  # loader padding
            if idx > num_warmup:
                n_timed += 1
            m = dets.mask[i]
            if not m.any():
                continue
            boxes = dets.boxes[i][m].astype(np.float64)
            if mirror_x:
                w = float(orig_hw[i][1])
                boxes = np.stack([w - boxes[:, 2], boxes[:, 1],
                                  w - boxes[:, 0], boxes[:, 3]], axis=1)
            d_imgs.append(np.full(int(m.sum()), int(img_id), np.int64))
            d_boxes.append(boxes)
            d_scores.append(dets.scores[i][m].astype(np.float64))
            d_classes.append(inv[dets.classes[i][m]])
        if idx == num_warmup:
            start = time.perf_counter()

    flat = {
        "img": (np.concatenate(d_imgs) if d_imgs
                else np.zeros(0, np.int64)),
        "box": (np.concatenate(d_boxes) if d_boxes
                else np.zeros((0, 4), np.float64)),
        "score": (np.concatenate(d_scores) if d_scores
                  else np.zeros(0, np.float64)),
        "cls": (np.concatenate(d_classes) if d_classes
                else np.zeros(0, np.int64)),
    }
    return flat, (n_timed, start)


def dataset_id_lut(meta) -> np.ndarray:
    """Contiguous-id -> dataset-id lookup array."""
    id_map = meta.thing_dataset_id_to_contiguous_id
    inv = np.zeros(max(id_map.values()) + 1, np.int64)
    for did, cid in id_map.items():
        inv[cid] = did
    return inv


def build_evaluator_for(dataset_name: str, etype: str = None):
    """COCO- or LVIS-protocol evaluator by type (reference dispatch,
    evaluator.py:44-50)."""
    meta = MetadataCatalog.get(dataset_name)
    if etype is None:
        etype = getattr(meta, "evaluator_type",
                        "lvis" if "lvis" in dataset_name else "coco")
    if etype.endswith("lvis"):
        from .lvis_eval import build_lvis_evaluator
        return build_lvis_evaluator(dataset_name)
    return build_coco_evaluator(dataset_name)


def score_detections(evaluator, flat: Dict[str, np.ndarray]) -> None:
    """Feed flat detection arrays into an evaluator, whole images at a
    time (the LVIS per-image maxDets cap needs complete groups)."""
    order = np.argsort(flat["img"], kind="mergesort")
    imgs_sorted = flat["img"][order]
    bounds = np.flatnonzero(np.diff(imgs_sorted)) + 1
    for grp in np.split(order, bounds):
        if len(grp):
            evaluator.process(int(flat["img"][grp[0]]),
                              flat["box"][grp], flat["score"][grp],
                              flat["cls"][grp])


def inference_on_detection_dataset(eval_step, params, loader, class_emb,
                                   dataset_name: str,
                                   per_category: bool = True,
                                   etype: str = None,
                                   gather_fn=gather_host_detections
                                   ) -> Dict[str, float]:
    """Run jitted inference over the loader, merge detections across
    hosts, accumulate COCO or LVIS metrics (protocol chosen like the
    reference's evaluator dispatch, evaluator.py:44-50)."""
    meta = MetadataCatalog.get(dataset_name)
    evaluator = build_evaluator_for(dataset_name, etype)
    flat, (n_timed, start) = collect_detections(
        eval_step, params, loader, class_emb, dataset_id_lut(meta))
    flat = gather_fn(flat)
    score_detections(evaluator, flat)

    elapsed = time.perf_counter() - start
    denom = max(n_timed, 1)
    logger.info(
        "Total inference time: %s (%.6f s / img)",
        datetime.timedelta(seconds=int(elapsed)), elapsed / denom)
    results = evaluator.summarize(per_category=per_category)
    results["images_per_second"] = denom / max(elapsed, 1e-9)
    return add_seen_unseen_summary(results, meta)


def add_seen_unseen_summary(results: Dict[str, float],
                            meta) -> Dict[str, float]:
    """Seen/unseen mean AP50 (CustomCOCOEvaluator,
    custom_coco_eval.py:96-137)."""
    from ..data.datasets.coco import categories_seen, categories_unseen
    seen = {c["name"] for c in categories_seen}
    unseen = {c["name"] for c in categories_unseen}
    names = list(getattr(meta, "thing_classes", []))
    for tag, group in (("seen", seen), ("unseen", unseen)):
        vals = [results.get(f"AP50-{n}") for n in names if n in group]
        vals = [v for v in vals if v is not None and not np.isnan(v)]
        if vals:
            results[f"AP50-{tag}"] = float(np.mean(vals))
        avals = [results.get(f"AP-{n}") for n in names if n in group]
        avals = [v for v in avals if v is not None and not np.isnan(v)]
        if avals:
            results[f"AP-{tag}"] = float(np.mean(avals))
    return results


def inference_on_caption_dataset(loss_step, params, loader, class_emb,
                                 rng) -> Tuple[Dict, Dict]:
    """Loss-only eval pass (inference_on_caption_ovr_dataset,
    evaluator.py:99-196): average loss/metric dicts over the loader."""
    totals: Dict[str, float] = {}
    n = 0
    total = len(loader)
    num_warmup = min(5, total - 1)
    start = time.perf_counter()
    compute = 0.0
    for idx, batch in enumerate(loader):
        t0 = time.perf_counter()
        rng, k = jax.random.split(rng)
        metrics = loss_step(params, batch, class_emb, k)
        metrics = {key: float(v) for key, v in metrics.items()}
        compute += time.perf_counter() - t0
        loss_total = sum(v for key, v in metrics.items()
                         if "loss" in key.lower())
        metrics["Total Loss"] = loss_total
        for key, v in metrics.items():
            totals[key] = totals.get(key, 0.0) + v
        n += 1
    elapsed = time.perf_counter() - start
    logger.info("Loss-eval time: %s (%.4f s/batch compute)",
                datetime.timedelta(seconds=int(elapsed)),
                compute / max(n - num_warmup, 1))
    # weight the averages by per-host batch counts (reference:
    # comm.gather-based metric merge); identity when single-process
    if jax.process_count() > 1 and totals:
        from jax.experimental import multihost_utils as mhu
        keys = sorted(totals)
        vec = np.asarray([totals[k] for k in keys] + [float(n)],
                         np.float64)
        summed = np.asarray(mhu.process_allgather(vec)).reshape(
            jax.process_count(), -1).sum(axis=0)
        totals = dict(zip(keys, summed[:-1]))
        n = int(summed[-1])
    avg = {k: v / max(n, 1) for k, v in totals.items()}
    losses = {k: v for k, v in avg.items() if "loss" in k.lower()}
    metrics = {k: v for k, v in avg.items() if "loss" not in k.lower()}
    return metrics, losses

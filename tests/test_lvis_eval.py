"""LVIS evaluator tests: analytic federated-protocol cases + the micro
LVIS fixture end-to-end. Protocol reference: lvis-api LVISEval as
consumed by d2 LVISEvaluator (ovr/evaluation/evaluator.py:17,48-50)."""
import os
import sys

import numpy as np
import pytest

from locov_tpu.evaluation.lvis_eval import LVISEvaluatorTPU

sys.path.insert(0, os.path.dirname(__file__))
from fixtures import make_micro_coco  # noqa: E402


def _gt(image_id, cat, box):
    x0, y0, x1, y1 = box
    return dict(image_id=image_id, category_id=cat, bbox=list(box),
                area=(x1 - x0) * (y1 - y0), iscrowd=0)


def test_unknown_category_detection_is_dropped():
    """Image 2 has no gt for cat 1 and doesn't verify it negative ->
    a (would-be) false positive there must not hurt cat-1 AP."""
    gts = [_gt(1, 1, [0, 0, 100, 100])]
    ev = LVISEvaluatorTPU(gts, [1, 2], [1])
    ev.process(1, np.array([[0, 0, 100, 100]]), np.array([0.9]),
               np.array([1]))
    ev.process(2, np.array([[0, 0, 50, 50]]), np.array([0.95]),
               np.array([1]))  # higher score, unknown cell -> dropped
    m = ev.summarize()
    assert abs(m["AP"] - 100.0) < 1e-6
    assert abs(m["AP50"] - 100.0) < 1e-6


def test_verified_negative_detection_is_fp():
    """Same detections, but image 2 verifies cat 1 negative -> the
    higher-scored detection is a real FP -> AP50 halves."""
    gts = [_gt(1, 1, [0, 0, 100, 100])]
    ev = LVISEvaluatorTPU(gts, [1, 2], [1],
                          neg_category_ids={2: [1]})
    ev.process(1, np.array([[0, 0, 100, 100]]), np.array([0.9]),
               np.array([1]))
    ev.process(2, np.array([[0, 0, 50, 50]]), np.array([0.95]),
               np.array([1]))
    m = ev.summarize()
    assert abs(m["AP50"] - 50.0) < 1e-6


def test_not_exhaustive_unmatched_detection_ignored():
    """cat 1 not exhaustively annotated on image 1: the unmatched
    higher-scored detection is ignored, not an FP."""
    gts = [_gt(1, 1, [0, 0, 100, 100])]
    dets = (np.array([[300.0, 300, 400, 400], [0, 0, 100, 100]]),
            np.array([0.95, 0.9]), np.array([1, 1]))

    strict = LVISEvaluatorTPU(gts, [1], [1])
    strict.process(1, *dets)
    assert abs(strict.summarize()["AP50"] - 50.0) < 1e-6

    lenient = LVISEvaluatorTPU(gts, [1], [1],
                               not_exhaustive_category_ids={1: [1]})
    lenient.process(1, *dets)
    m = lenient.summarize()
    assert abs(m["AP50"] - 100.0) < 1e-6
    # matched detections in a not-exhaustive cell still count
    assert abs(m["AR@300"] - 100.0) < 1e-6


def test_max_dets_300_cap_across_categories():
    """Per-image cap is 300 across ALL categories by score, not 100."""
    gts = [_gt(1, 1, [0, 0, 10, 10])]
    ev = LVISEvaluatorTPU(gts, [1], [1, 2], neg_category_ids={1: [2]})
    # 300 high-scoring cat-2 FPs + 1 lower-scoring cat-1 TP: the TP is
    # det #301 by score and must be evicted by the cap -> recall 0
    boxes = np.tile(np.array([[500.0, 500, 510, 510]]), (300, 1))
    boxes = np.concatenate([boxes, [[0.0, 0, 10, 10]]])
    scores = np.concatenate([np.linspace(0.9, 0.5, 300), [0.4]])
    cats = np.array([2] * 300 + [1])
    ev.process(1, boxes, scores, cats)
    m = ev.summarize()
    assert abs(m["AR@300"] - 0.0) < 1e-6
    # with one fewer FP the TP survives the cap
    ev2 = LVISEvaluatorTPU(gts, [1], [1, 2], neg_category_ids={1: [2]})
    ev2.process(1, boxes[1:], scores[1:], cats[1:])
    assert abs(ev2.summarize()["AR@300"] - 100.0) < 1e-6


def test_frequency_bucket_aps():
    """APr/APc/APf average per-frequency-group category APs."""
    gts = [_gt(1, 1, [0, 0, 100, 100]), _gt(1, 2, [0, 0, 100, 100])]
    ev = LVISEvaluatorTPU(
        gts, [1], [1, 2], class_names=["rare_thing", "freq_thing"],
        freq_groups={"r": [1], "f": [2]})
    # cat 1 (rare): perfect. cat 2 (frequent): FP above TP -> AP50 50
    ev.process(1,
               np.array([[0.0, 0, 100, 100],
                         [300.0, 300, 400, 400], [0.0, 0, 100, 100]]),
               np.array([0.9, 0.95, 0.8]), np.array([1, 2, 2]))
    m = ev.summarize(per_category=True)
    assert abs(m["APr"] - 100.0) < 1e-6
    assert m["APf"] < 100.0
    assert "APc" not in m  # no common group configured
    assert abs(m["AP-rare_thing"] - 100.0) < 1e-6
    assert abs(m["AP"] - (m["APr"] + m["APf"]) / 2) < 1e-6


# ------------------------------------------------------- micro end-to-end
@pytest.fixture(scope="module")
def micro_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("micro_lvis_eval"))
    make_micro_coco(root)
    return root


def _fresh():
    from locov_tpu.data import DatasetCatalog, MetadataCatalog
    for name in list(DatasetCatalog._registry):
        DatasetCatalog.remove(name)
    for name in list(MetadataCatalog._store):
        MetadataCatalog.remove(name)


def test_build_lvis_evaluator_from_registration(micro_root):
    """Registered micro-LVIS -> evaluator with neg/nel knowledge and
    freq buckets; perfect detections on gt -> AP 100 everywhere."""
    _fresh()
    from locov_tpu.data import get_register_dataset, DatasetCatalog, \
        MetadataCatalog
    from locov_tpu.evaluation.lvis_eval import build_lvis_evaluator
    name = "lvis_v1_generalized_val"
    get_register_dataset(name)(name, micro_root)
    recs = DatasetCatalog.get(name)
    meta = MetadataCatalog.get(name)
    ev = build_lvis_evaluator(name)
    assert set(ev.freq_groups) == {"r", "c", "f"}
    assert any(ev._neg.values())           # fixture wrote neg ids
    assert any(ev._nel.values())           # and not-exhaustive ids
    id_map = meta.thing_dataset_id_to_contiguous_id
    inv = {v: k for k, v in id_map.items()}
    for rec in recs:
        anns = rec["annotations"]
        if not anns:
            continue
        boxes = np.array([a["bbox"] for a in anns], np.float64)
        cats = np.array([inv[a["category_id"]] for a in anns])
        scores = np.linspace(0.95, 0.9, len(anns))
        ev.process(rec["image_id"], boxes, scores, cats)
    m = ev.summarize()
    assert abs(m["AP"] - 100.0) < 1e-6
    present = {c for (_, c), anns in ev._gts.items() if anns}
    assert present
    for tag in ("r", "c", "f"):
        if ev.freq_groups[tag] & present:
            assert abs(m[f"AP{tag}"] - 100.0) < 1e-6
        else:
            assert np.isnan(m[f"AP{tag}"])  # empty bucket stays NaN
    assert abs(m["AR@300"] - 100.0) < 1e-6


def test_detection_inference_routes_to_lvis(micro_root, monkeypatch):
    """inference_on_detection_dataset must dispatch the LVIS protocol
    for lvis datasets (the round-1 silent-COCO bug)."""
    _fresh()
    from locov_tpu.data import get_register_dataset
    from locov_tpu.evaluation import evaluator as ev_mod
    name = "lvis_v1_generalized_val"
    get_register_dataset(name)(name, micro_root)
    seen = {}
    import locov_tpu.evaluation.lvis_eval as lvis_mod
    real = lvis_mod.build_lvis_evaluator

    def spy(ds):
        seen["called"] = ds
        return real(ds)

    monkeypatch.setattr(lvis_mod, "build_lvis_evaluator", spy)

    class _Batch:
        pass

    # empty loader: routing is what's under test
    out = ev_mod.inference_on_detection_dataset(
        lambda *a: None, None, [], None, name)
    assert seen["called"] == name
    assert "APr" in out or "AP" in out

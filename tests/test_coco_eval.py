"""COCO evaluator tests with analytically-known APs."""
import numpy as np

from locov_tpu.evaluation.coco_eval import COCOEvaluatorTPU


def _gt(image_id, cat, box, **kw):
    x0, y0, x1, y1 = box
    return dict(image_id=image_id, category_id=cat, bbox=list(box),
                area=(x1 - x0) * (y1 - y0), iscrowd=0, **kw)


def test_perfect_detections_ap_100():
    gts = [_gt(1, 1, [10, 10, 50, 50]), _gt(1, 1, [60, 60, 90, 90]),
           _gt(2, 1, [0, 0, 30, 40])]
    ev = COCOEvaluatorTPU(gts, [1, 2], [1])
    ev.process(1, np.array([[10, 10, 50, 50], [60, 60, 90, 90]]),
               np.array([0.9, 0.8]), np.array([1, 1]))
    ev.process(2, np.array([[0, 0, 30, 40]]), np.array([0.7]),
               np.array([1]))
    m = ev.summarize()
    assert abs(m["AP"] - 100.0) < 1e-6
    assert abs(m["AP50"] - 100.0) < 1e-6
    assert abs(m["AR@100"] - 100.0) < 1e-6


def test_iou_threshold_sensitivity():
    # det overlaps gt with IoU = 0.6: counts at 0.5/0.55/0.6 but not above
    gts = [_gt(1, 1, [0, 0, 100, 100])]
    ev = COCOEvaluatorTPU(gts, [1], [1])
    # shifted box: inter = 100x60, union = 2*10000-6000 -> IoU = 0.429
    # use a containment instead: det [0,0,100,60]: inter 6000, union 10000
    ev.process(1, np.array([[0, 0, 100, 60]]), np.array([0.9]),
               np.array([1]))
    m = ev.summarize()
    # IoU = 0.6 -> matches at thresholds .5, .55, .6 -> 3/10 of full AP
    assert abs(m["AP50"] - 100.0) < 1e-6
    assert abs(m["AP75"] - 0.0) < 1e-6
    assert abs(m["AP"] - 30.0) < 1e-6


def test_false_positive_above_tp_halves_ap():
    gts = [_gt(1, 1, [0, 0, 100, 100])]
    ev = COCOEvaluatorTPU(gts, [1], [1])
    ev.process(1, np.array([[200, 200, 300, 300], [0, 0, 100, 100]]),
               np.array([0.95, 0.9]), np.array([1, 1]))
    m = ev.summarize()
    assert abs(m["AP50"] - 50.0) < 1e-6  # precision 0.5 at every recall


def test_false_positive_below_tp_keeps_ap():
    gts = [_gt(1, 1, [0, 0, 100, 100])]
    ev = COCOEvaluatorTPU(gts, [1], [1])
    ev.process(1, np.array([[0, 0, 100, 100], [200, 200, 300, 300]]),
               np.array([0.95, 0.9]), np.array([1, 1]))
    m = ev.summarize()
    assert abs(m["AP50"] - 100.0) < 1e-6


def test_crowd_gt_not_counted_and_absorbs_dets():
    gts = [_gt(1, 1, [0, 0, 100, 100]),
           dict(image_id=1, category_id=1, bbox=[200, 200, 400, 400],
                area=200 * 200, iscrowd=1)]
    ev = COCOEvaluatorTPU(gts, [1], [1])
    # second det falls inside the crowd region: must be ignored, not FP
    ev.process(1, np.array([[0, 0, 100, 100], [250, 250, 300, 300]]),
               np.array([0.9, 0.8]), np.array([1, 1]))
    m = ev.summarize()
    assert abs(m["AP"] - 100.0) < 1e-6


def test_missed_gt_halves_recall():
    gts = [_gt(1, 1, [0, 0, 100, 100]), _gt(1, 1, [300, 300, 400, 400])]
    ev = COCOEvaluatorTPU(gts, [1], [1])
    ev.process(1, np.array([[0, 0, 100, 100]]), np.array([0.9]),
               np.array([1]))
    m = ev.summarize()
    assert abs(m["AR@100"] - 50.0) < 1e-6
    # precision 1.0 up to recall 0.5, zero after -> 101-pt AP ~ 50.5
    assert 50.0 <= m["AP50"] <= 51.0


def test_per_category_and_unseen_categories():
    gts = [_gt(1, 1, [0, 0, 100, 100]), _gt(1, 2, [0, 0, 50, 50])]
    ev = COCOEvaluatorTPU(gts, [1], [1, 2, 3], ["a", "b", "c"])
    ev.process(1, np.array([[0, 0, 100, 100]]), np.array([0.9]),
               np.array([1]))
    m = ev.summarize(per_category=True)
    assert abs(m["AP-a"] - 100.0) < 1e-6
    assert abs(m["AP-b"] - 0.0) < 1e-6
    assert np.isnan(m["AP-c"])  # no gt for c -> excluded entirely
    # overall AP averages only over categories with gt
    assert abs(m["AP"] - 50.0) < 1e-6


def test_max_dets_limits():
    gts = [_gt(1, 1, [0, 0, 10, 10]), _gt(1, 1, [20, 20, 30, 30])]
    ev = COCOEvaluatorTPU(gts, [1], [1])
    ev.process(1, np.array([[0, 0, 10, 10], [20, 20, 30, 30]]),
               np.array([0.9, 0.8]), np.array([1, 1]))
    m = ev.summarize()
    assert abs(m["AR@1"] - 50.0) < 1e-6
    assert abs(m["AR@100"] - 100.0) < 1e-6


def test_area_range_filtering():
    # one small gt (20x20=400 < 1024) and one large (200x200)
    gts = [_gt(1, 1, [0, 0, 20, 20]), _gt(1, 1, [50, 50, 250, 250])]
    ev = COCOEvaluatorTPU(gts, [1], [1])
    ev.process(1, np.array([[0, 0, 20, 20], [50, 50, 250, 250]]),
               np.array([0.9, 0.8]), np.array([1, 1]))
    m = ev.summarize()
    assert abs(m["APs"] - 100.0) < 1e-6
    assert abs(m["APl"] - 100.0) < 1e-6
    assert np.isnan(m["APm"])

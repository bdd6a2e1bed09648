"""Label-noise injector fidelity vs the reference semantics
(ovr/data/detection_utils.py:105-213)."""
import random

import numpy as np

from locov_tpu.data.mappers import (add_noise_annotation, add_noise_cls,
                                    add_noise_loc, ign_annotation,
                                    online_ign_annotation, rm_annotation)


def _anns(n, cls=0):
    return [{"bbox": [10 + i, 20, 60 + i, 90], "category_id": cls,
             "iscrowd": 0} for i in range(n)]


def test_rm_annotation_keeps_int_fraction():
    rng = random.Random(0)
    out = rm_annotation(_anns(10), 0.25, rng)
    # reference: n_keep = int((1-0.25)*10) = 7
    assert len(out) == 7


def test_rm_annotation_noop_when_all_would_drop():
    rng = random.Random(0)
    anns = _anns(3)
    out = rm_annotation(anns, 0.99, rng)  # n_keep = int(0.03) = 0
    assert out is anns  # reference returns the record unchanged


def test_add_noise_cls_relabels_every_box():
    rng = random.Random(1)
    anns = _anns(50, cls=7)
    out = add_noise_cls(anns, 80, rng)
    assert len(out) == 50
    # every box independently relabeled: with 50 draws over 80 classes
    # the original label cannot survive everywhere
    assert any(a["category_id"] != 7 for a in out)
    changed = sum(a["category_id"] != 7 for a in out)
    assert changed > 30  # ~49.4 expected; all-boxes semantics, not one
    assert all(a["category_id"] == 7 for a in anns)  # input untouched


def test_add_noise_loc_jitters_every_box_within_eighth():
    rng = random.Random(2)
    anns = _anns(20)
    out = add_noise_loc(anns, (480, 640), rng)
    assert len(out) == 20
    moved = 0
    for a, b in zip(anns, out):
        ox0, oy0, ox1, oy1 = a["bbox"]
        nx0, ny0, nx1, ny1 = b["bbox"]
        bw, bh = ox1 - ox0, oy1 - oy0
        # origin shift bounded by dim//8; size change bounded likewise
        assert abs(nx0 - ox0) <= bw // 8 and abs(ny0 - oy0) <= bh // 8
        assert abs((nx1 - nx0) - bw) <= bw // 8
        assert abs((ny1 - ny0) - bh) <= bh // 8
        assert nx0 >= 0 and ny0 >= 0
        moved += b["bbox"] != a["bbox"]
    assert moved > 10  # all boxes are candidates, most should move


def test_add_noise_annotation_counts():
    rng = random.Random(3)
    out = add_noise_annotation(_anns(10), 0.5, 80, (480, 640), rng)
    assert len(out) == 15  # frac<1: int(0.5*10) added
    out = add_noise_annotation(_anns(10), 3, 80, (480, 640), rng)
    assert len(out) == 13  # frac>=1: absolute count
    for a in out[10:]:
        x0, y0, x1, y1 = a["bbox"]
        assert 640 // 6 <= x1 - x0 <= 640 * 4 // 6
        assert 480 // 6 <= y1 - y0 <= 480 * 4 // 6
        assert 0 <= a["category_id"] < 80


def test_ign_annotation_offline_uses_num_classes_slot():
    rng = random.Random(4)
    out = ign_annotation(_anns(10, cls=3), 0.3, 48, rng)
    ignored = [a for a in out if a["category_id"] == 48]
    kept = [a for a in out if a["category_id"] == 3]
    assert len(out) == 10  # boxes are marked, never dropped
    assert len(kept) == 7 and len(ignored) == 3


def test_online_ign_annotation_keys_off_ignore_name():
    classes = ["cat", "ignore", "dog"]
    anns = [{"bbox": [0, 0, 10, 10], "category_id": i % 3}
            for i in range(6)]
    out = online_ign_annotation(anns, classes)
    for a_in, a_out in zip(anns, out):
        if classes[a_in["category_id"]] == "ignore":
            assert a_out["category_id"] == -1
        else:
            assert a_out["category_id"] == a_in["category_id"]

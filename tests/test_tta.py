"""TEST.AUG test-time augmentation: merge semantics + fixture e2e."""
import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

from locov_tpu.evaluation.tta import (greedy_nms, merge_tta_detections,
                                      inference_with_tta)
from locov_tpu.structures.batches import Detections

sys.path.insert(0, os.path.dirname(__file__))
from fixtures import make_micro_coco  # noqa: E402


def test_greedy_nms_suppresses_overlaps():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                     np.float64)
    scores = np.array([0.8, 0.9, 0.7])
    keep = greedy_nms(boxes, scores, 0.5)
    assert keep.tolist() == [1, 2]


def test_merge_collapses_duplicate_augs_and_keeps_classes_separate():
    flat = {
        "img": np.array([1, 1, 1, 1], np.int64),
        "box": np.array([[0, 0, 10, 10], [0.5, 0, 10, 10],
                         [0, 0, 10, 10], [40, 40, 50, 50]], np.float64),
        "score": np.array([0.9, 0.85, 0.8, 0.7]),
        # det 3 overlaps det 1 but is another class: survives
        "cls": np.array([1, 1, 2, 1], np.int64),
    }
    merged = merge_tta_detections(flat, nms_thresh=0.5, topk=100)
    assert len(merged["score"]) == 3
    assert sorted(merged["cls"].tolist()) == [1, 1, 2]


def test_merge_topk_cap():
    n = 30
    flat = {
        "img": np.zeros(n, np.int64),
        "box": np.stack([np.arange(n) * 100.0, np.zeros(n),
                         np.arange(n) * 100.0 + 10, np.full(n, 10.0)],
                        axis=1),
        "score": np.linspace(0.9, 0.1, n),
        "cls": np.zeros(n, np.int64),
    }
    merged = merge_tta_detections(flat, nms_thresh=0.5, topk=5)
    assert len(merged["score"]) == 5
    assert (merged["score"] >= 0.7).all()  # keeps highest scores


# ---------------------------------------------------------------- fixture e2e
K = 8


@pytest.fixture(scope="module")
def micro_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("micro_tta"))
    make_micro_coco(root)
    return root


def _fresh():
    from locov_tpu.data import DatasetCatalog, MetadataCatalog
    for name in list(DatasetCatalog._registry):
        DatasetCatalog.remove(name)
    for name in list(MetadataCatalog._store):
        MetadataCatalog.remove(name)


class FakeLoader:
    def __init__(self, records, mirror=False):
        self.records = records
        self.mirror = mirror

    def __len__(self):
        return len(self.records)

    def __iter__(self):
        for r in self.records:
            yield SimpleNamespace(
                images=SimpleNamespace(
                    image_id=np.asarray([r["image_id"]]),
                    orig_hw=np.asarray([[r["height"], r["width"]]])),
                _rec=r, _mirror=self.mirror)


def _fake_eval_step(params, batch, class_emb):
    """Perfect detections from gt; mirrored when the loader is the
    'flipped' augmentation."""
    r = batch._rec
    boxes, scores, classes = [], [], []
    for a in r["annotations"]:
        b = np.asarray(a["bbox"], np.float64)
        if batch._mirror:
            w = r["width"]
            b = np.array([w - b[2], b[1], w - b[0], b[3]])
        boxes.append(b)
        scores.append(0.9)
        classes.append(a["category_id"])
    n = len(boxes)
    out_b = np.zeros((1, K, 4), np.float32)
    out_b[0, :n] = np.stack(boxes)[:K]
    out_s = np.zeros((1, K), np.float32)
    out_s[0, :n] = np.asarray(scores)[:K]
    out_c = np.zeros((1, K), np.int32)
    out_c[0, :n] = np.asarray(classes)[:K]
    mask = np.zeros((1, K), bool)
    mask[0, :n] = True
    return Detections(boxes=out_b, scores=out_s, classes=out_c,
                      mask=mask)


def test_tta_flip_merge_equals_perfect_ap(micro_root):
    """Normal + flipped passes produce duplicate (mirrored) detections;
    after mirror-back + NMS merge the AP is the perfect-detector 100."""
    _fresh()
    from locov_tpu.data import get_register_dataset, DatasetCatalog
    name = "coco_zeroshot_val"
    get_register_dataset(name)(name, micro_root)
    recs = DatasetCatalog.get(name)

    loaders = [(FakeLoader(recs, mirror=False), False),
               (FakeLoader(recs, mirror=True), True)]
    res = inference_with_tta(_fake_eval_step, None, loaders, None, name,
                             nms_thresh=0.5, topk=10)
    assert res["AP"] == pytest.approx(100.0, abs=1e-6)
    assert res["AP50"] == pytest.approx(100.0, abs=1e-6)


def test_tta_loader_construction(micro_root):
    """build_tta_loaders yields one loader per (scale, flip) with the
    forced-flip mapper mode set."""
    _fresh()
    from locov_tpu.data import get_register_dataset
    from locov_tpu.evaluation.tta import build_tta_loaders
    from fixtures import micro_cfg
    name = "coco_zeroshot_val"
    get_register_dataset(name)(name, micro_root)
    cfg = micro_cfg(micro_root, "OvrRCNN")
    cfg.TEST.AUG.ENABLED = True
    cfg.TEST.AUG.MIN_SIZES = (64, 96)
    cfg.TEST.AUG.MAX_SIZE = 128
    cfg.TEST.AUG.FLIP = True

    class FakeTrainer:
        tokenizer = None
        needs_text = False

        def build_test_loader(self, c, ds):
            from locov_tpu.engine.trainer import OVRTrainer
            return OVRTrainer.build_test_loader(self, c, ds)

    loaders = build_tta_loaders(FakeTrainer(), cfg, name)
    assert len(loaders) == 4
    assert [f for _, f in loaders] == [False, True, False, True]
    assert loaders[1][0].mapper.flip_mode == "horizontal_always"
    assert loaders[0][0].mapper.min_sizes == (64,)
    # flipped loader round-trips a sample
    sample = next(iter(loaders[1][0]))
    assert sample.images.image.shape[0] >= 1

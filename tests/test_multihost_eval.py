"""Cross-host eval merging: a 2-host-simulated sharded evaluation must
produce EXACTLY the single-process metrics (the reference merges
predictions via comm.gather inside d2 inference_on_dataset, SURVEY
§3.3; round 1 scored only the local shard)."""
import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

from locov_tpu.structures.batches import Detections

sys.path.insert(0, os.path.dirname(__file__))
from fixtures import make_micro_coco  # noqa: E402

K = 8  # fixed per-image detection slots


@pytest.fixture(scope="module")
def micro_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("micro_mh"))
    make_micro_coco(root)
    return root


def _fresh():
    from locov_tpu.data import DatasetCatalog, MetadataCatalog
    for name in list(DatasetCatalog._registry):
        DatasetCatalog.remove(name)
    for name in list(MetadataCatalog._store):
        MetadataCatalog.remove(name)


def _synth_dets(rec, id_map_size):
    """Deterministic detections per image: jittered gts + noise box."""
    rng = np.random.RandomState(rec["image_id"] % 100000)
    boxes, scores, classes = [], [], []
    for a in rec["annotations"]:
        b = np.asarray(a["bbox"], np.float32)
        boxes.append(b + rng.uniform(-2, 2, 4).astype(np.float32))
        scores.append(rng.uniform(0.5, 1.0))
        classes.append(a["category_id"])
    boxes.append(np.asarray([1, 1, 9, 9], np.float32))
    scores.append(rng.uniform(0.1, 0.4))
    classes.append(rng.randint(0, id_map_size))
    n = len(boxes)
    out_b = np.zeros((K, 4), np.float32)
    out_b[:n] = np.stack(boxes)[:K]
    out_s = np.zeros(K, np.float32)
    out_s[:n] = np.asarray(scores)[:K]
    out_c = np.zeros(K, np.int32)
    out_c[:n] = np.asarray(classes)[:K]
    mask = np.arange(K) < n
    return out_b, out_s, out_c, mask


class FakeLoader:
    """Minimal loader: batches of 2 with -1 padding on the tail."""

    def __init__(self, records):
        self.records = records

    def __len__(self):
        return (len(self.records) + 1) // 2

    def __iter__(self):
        for i in range(0, len(self.records), 2):
            chunk = self.records[i:i + 2]
            ids = [r["image_id"] for r in chunk] + \
                [-1] * (2 - len(chunk))
            yield SimpleNamespace(
                images=SimpleNamespace(image_id=np.asarray(ids)),
                _records=chunk)


def _eval_step_factory(n_classes):
    def eval_step(params, batch, class_emb):
        outs = [_synth_dets(r, n_classes) for r in batch._records]
        while len(outs) < 2:  # loader padding row
            outs.append((np.zeros((K, 4), np.float32),
                         np.zeros(K, np.float32), np.zeros(K, np.int32),
                         np.zeros(K, bool)))
        b, s, c, m = zip(*outs)
        return Detections(boxes=np.stack(b), scores=np.stack(s),
                          classes=np.stack(c), mask=np.stack(m))
    return eval_step


def test_two_host_sharded_eval_equals_single_process(micro_root):
    _fresh()
    from locov_tpu.data import get_register_dataset, DatasetCatalog, \
        MetadataCatalog
    from locov_tpu.evaluation.evaluator import \
        inference_on_detection_dataset

    name = "lvis_v1_generalized_val"
    get_register_dataset(name)(name, micro_root)
    recs = DatasetCatalog.get(name)
    n_classes = len(MetadataCatalog.get(name).thing_classes)
    step = _eval_step_factory(n_classes)

    single = inference_on_detection_dataset(
        step, None, FakeLoader(recs), None, name)

    # contiguous InferenceSampler-style shards
    half = len(recs) // 2
    shards = [recs[:half], recs[half:]]

    # pass 1: capture each simulated host's local detection arrays
    local_flats = []

    def capture(flat):
        local_flats.append(flat)
        return {k: v[:0] for k, v in flat.items()}  # score nothing yet

    for shard in shards:
        inference_on_detection_dataset(
            step, None, FakeLoader(shard), None, name,
            gather_fn=capture)
    assert len(local_flats) == 2
    merged = {k: np.concatenate([f[k] for f in local_flats])
              for k in local_flats[0]}

    # pass 2: each host all-gathers the global set -> identical result
    for shard in shards:
        res = inference_on_detection_dataset(
            step, None, FakeLoader(shard), None, name,
            gather_fn=lambda flat: merged)
        for k, v in single.items():
            if k == "images_per_second":
                continue
            if isinstance(v, float) and np.isnan(v):
                assert np.isnan(res[k]), k
            else:
                assert res[k] == pytest.approx(v, abs=1e-9), k

"""LVIS registration tests on the synthetic micro fixture: frequency
splits, contiguous-id remapping, captions/embeddings, loader pass."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from fixtures import make_micro_coco, micro_cfg  # noqa: E402


@pytest.fixture(scope="module")
def micro_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("micro_lvis"))
    make_micro_coco(root)
    return root


def _fresh():
    from locov_tpu.data import DatasetCatalog, MetadataCatalog
    for name in list(DatasetCatalog._registry):
        DatasetCatalog.remove(name)
    for name in list(MetadataCatalog._store):
        MetadataCatalog.remove(name)


def test_lvis_full_registration(micro_root):
    _fresh()
    from locov_tpu.data import get_register_dataset, DatasetCatalog, \
        MetadataCatalog
    get_register_dataset("lvis_v1_all_train")(
        "lvis_v1_all_train", micro_root)
    recs = DatasetCatalog.get("lvis_v1_all_train")
    meta = MetadataCatalog.get("lvis_v1_all_train")
    assert len(recs) == 8
    assert meta.thing_classes == ["cat", "dog", "car"]
    assert meta.freq_classes == {"f": ["cat"], "c": ["dog"],
                                 "r": ["car"]}
    assert os.path.exists(recs[0]["file_name"]), recs[0]["file_name"]
    assert meta.get("class_emb_mtx").shape == (4, 16)


def test_lvis_base_split_filters_rare(micro_root):
    _fresh()
    from locov_tpu.data import get_register_dataset, DatasetCatalog, \
        MetadataCatalog
    get_register_dataset("lvis_v1_base_train")(
        "lvis_v1_base_train", micro_root)
    recs = DatasetCatalog.get("lvis_v1_base_train")
    meta = MetadataCatalog.get("lvis_v1_base_train")
    # base = (c, f) -> rare 'car' dropped, ids remapped contiguous
    assert meta.thing_classes == ["cat", "dog"]
    cats = {a["category_id"] for r in recs for a in r["annotations"]}
    assert cats <= {0, 1}
    assert meta.get("class_emb_mtx").shape == (3, 16)


def test_lvis_novel_split(micro_root):
    _fresh()
    from locov_tpu.data import get_register_dataset, DatasetCatalog, \
        MetadataCatalog
    get_register_dataset("lvis_v1_novel_val")(
        "lvis_v1_novel_val", micro_root)
    meta = MetadataCatalog.get("lvis_v1_novel_val")
    assert meta.thing_classes == ["car"]


def test_lvis_caption_dataset_and_loader(micro_root):
    _fresh()
    from locov_tpu.data import (get_register_dataset, get_mapper,
                                DatasetCatalog, MetadataCatalog)
    from locov_tpu.data.loader import DataLoader, InferenceSampler
    name = "lvis_v1_caption_val"
    get_register_dataset(name)(name, micro_root)
    recs = DatasetCatalog.get(name)
    meta = MetadataCatalog.get(name)
    assert meta.get("captions_dict")  # glob-merged caption files
    cfg = micro_cfg(micro_root, "OvrRCNN")
    mapper = get_mapper(name, cfg, is_train=False)
    loader = DataLoader(recs, mapper, InferenceSampler(len(recs)),
                        batch_size=2, buckets=[(96, 96)], gt_slots=8,
                        has_text=False, is_train=False)
    batches = list(loader)
    assert sum(int((np.asarray(b.images.image_id) >= 0).sum())
               for b in batches) == len(recs)
    # evaluator-type selection dispatches 'lvis'
    from locov_tpu.evaluation.evaluator import select_evaluator_type
    assert select_evaluator_type(cfg, name) == "lvis"

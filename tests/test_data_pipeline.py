"""Data pipeline unit tests: transforms, mapper semantics (OLN
proposals -> binary gt, black-image fallback), bucket collation,
samplers."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from fixtures import make_micro_coco, micro_cfg  # noqa: E402

from locov_tpu.data import transforms as Tr
from locov_tpu.data.loader import (DataLoader, InferenceSampler,
                                   TrainingSampler, collate,
                                   derive_buckets, _pick_bucket)


def test_resize_shortest_edge_semantics():
    img = np.zeros((100, 200, 3), np.uint8)
    out, _ = Tr.resize_shortest_edge(img, 50, 1000)
    assert out.shape[:2] == (50, 100)
    # max_size cap shrinks further
    out2, _ = Tr.resize_shortest_edge(img, 50, 80)
    assert out2.shape[1] == 80 and out2.shape[0] == 40


def test_flip_boxes_roundtrip():
    boxes = np.array([[10.0, 20.0, 30.0, 40.0]])
    flipped = Tr.hflip_boxes(boxes, 100)
    np.testing.assert_allclose(flipped, [[70.0, 20.0, 90.0, 40.0]])
    np.testing.assert_allclose(Tr.hflip_boxes(flipped, 100), boxes)


def test_derive_buckets_and_pick():
    from locov_tpu.config import get_cfg
    cfg = get_cfg()
    cfg.INPUT.MIN_SIZE_TEST = 800
    cfg.INPUT.MAX_SIZE_TEST = 1333
    buckets = derive_buckets(cfg, False)
    assert (800, 1344) in buckets and (1344, 800) in buckets
    assert _pick_bucket((780, 1200), buckets) == (800, 1344)
    assert _pick_bucket((1200, 780), buckets) == (1344, 800)
    assert _pick_bucket((790, 795), buckets) == (800, 800)


def test_samplers():
    s = TrainingSampler(10, seed=0, rank=1, world_size=2)
    it = iter(s)
    first = [next(it) for _ in range(10)]
    assert len(first) == 10  # infinite, sharded
    inf = InferenceSampler(10, rank=1, world_size=3)
    assert list(inf) == [4, 5, 6, 7]


def test_collate_pads_and_masks(rng):
    recs = []
    for i in range(2):
        recs.append({
            "image": rng.rand(20 + i, 30, 3).astype(np.float32),
            "hw": np.array([20 + i, 30], np.int32),
            "orig_hw": np.array([40, 60], np.int32),
            "image_id": np.int64(i),
            "gt_boxes": rng.rand(i + 1, 4).astype(np.float32),
            "gt_classes": np.arange(i + 1, dtype=np.int32),
        })
    batch = collate(recs, bucket=(32, 32), gt_slots=4, has_text=False)
    assert batch.images.image.shape == (2, 32, 32, 3)
    assert batch.gt.boxes.shape == (2, 4, 4)
    np.testing.assert_array_equal(batch.gt.mask.sum(axis=1), [1, 2])
    # padding area is zero
    assert batch.images.image[0, 25:].sum() == 0


def test_mapper_oln_proposals_become_binary_gt(tmp_path, rng):
    root = str(tmp_path)
    make_micro_coco(root)
    from locov_tpu.data import DatasetCatalog, MetadataCatalog
    from locov_tpu.data.datasets.coco import register_dataset
    from locov_tpu.data.mappers import DetectionMapper
    for name in list(DatasetCatalog._registry):
        DatasetCatalog.remove(name)
    for name in list(MetadataCatalog._store):
        MetadataCatalog.remove(name)
    name = "coco_captions_train_seen_proposals"
    register_dataset(name, root)
    records = DatasetCatalog.get(name)
    meta = MetadataCatalog.get(name)

    cfg = micro_cfg(root, "DistillProposalMMSSRCNN")
    cfg.MODEL.LOAD_OBJ_PROPOSALS = True
    mapper = DetectionMapper(cfg, meta, is_train=True, seed=0)
    rec = mapper(records[0])
    # proposals replaced gt: classes all 1, original gt stashed
    assert (rec["gt_classes"] == 1).all()
    assert "gt_obj_boxes" in rec
    assert len(rec["gt_boxes"]) <= cfg.TPU.MAX_PRECOMPUTED_PROPOSALS
    assert "caption" in rec and isinstance(rec["caption"], str)
    # boxes live inside the resized frame
    h, w = rec["hw"]
    assert rec["gt_boxes"][:, 2].max() <= w + 1e-4
    assert rec["gt_boxes"][:, 3].max() <= h + 1e-4


def test_mapper_black_image_fallback(tmp_path, rng):
    root = str(tmp_path)
    make_micro_coco(root)
    from locov_tpu.data import DatasetCatalog, MetadataCatalog
    from locov_tpu.data.datasets.coco import register_dataset
    from locov_tpu.data.mappers import DetectionMapper
    for name in list(DatasetCatalog._registry):
        DatasetCatalog.remove(name)
    for name in list(MetadataCatalog._store):
        MetadataCatalog.remove(name)
    register_dataset("coco_captions_val", root)
    meta = MetadataCatalog.get("coco_captions_val")
    rec_src = dict(DatasetCatalog.get("coco_captions_val")[0])
    rec_src["file_name"] = "/nonexistent/missing.jpg"
    cfg = micro_cfg(root, "DistillProposalMMSSRCNN")
    mapper = DetectionMapper(cfg, meta, is_train=False, seed=0)
    rec = mapper(rec_src)
    # black image + replaced caption (basic_mappers.py:100-106,189-190)
    assert rec["image"].sum() == 0
    assert rec["caption"] == "A black image."


def test_loader_finite_epoch_pads_with_sentinel(tmp_path, rng):
    root = str(tmp_path)
    make_micro_coco(root, n_val=3)
    from locov_tpu.data import DatasetCatalog, MetadataCatalog
    from locov_tpu.data.datasets.coco import register_dataset
    from locov_tpu.data.mappers import DetectionMapper
    for name in list(DatasetCatalog._registry):
        DatasetCatalog.remove(name)
    for name in list(MetadataCatalog._store):
        MetadataCatalog.remove(name)
    register_dataset("coco_zeroshot_val", root)
    records = DatasetCatalog.get("coco_zeroshot_val")
    meta = MetadataCatalog.get("coco_zeroshot_val")
    cfg = micro_cfg(root, "OvrRCNN")
    mapper = DetectionMapper(cfg, meta, is_train=False, seed=0)
    loader = DataLoader(records, mapper, InferenceSampler(len(records)),
                        batch_size=2, buckets=[(96, 96)], gt_slots=8,
                        has_text=False, is_train=False)
    batches = list(loader)
    ids = np.concatenate([np.asarray(b.images.image_id)
                          for b in batches])
    real = ids[ids >= 0]
    assert len(real) == len(records)
    # partial batch padded with -1 sentinel
    assert (ids < 0).sum() == (2 - len(records) % 2) % 2


def test_thread_map_ordered_and_propagates():
    from locov_tpu.data.loader import _thread_map

    out = list(_thread_map(lambda x: x * x, range(37), workers=4))
    assert out == [i * i for i in range(37)]

    def boom(x):
        if x == 5:
            raise ValueError("boom")
        return x

    import pytest
    with pytest.raises(ValueError, match="boom"):
        list(_thread_map(boom, range(10), workers=3))


def test_thread_map_infinite_iterator_window():
    """The pool must keep a bounded in-flight window on an endless
    source (training sampler) — pulling N results must not consume
    unboundedly from the iterator."""
    from itertools import count

    from locov_tpu.data.loader import _thread_map

    pulled = []

    def src():
        for i in count():
            pulled.append(i)
            yield i

    it = _thread_map(lambda x: x, src(), workers=2)
    got = [next(it) for _ in range(20)]
    assert got == list(range(20))
    assert len(pulled) <= 20 + 2 * 4 + 1  # window = workers * 4


def test_process_map_ordered_and_propagates():
    """Fork-pool map: order preserved, exceptions surface, bounded
    window on an endless source (DATALOADER.WORKER_BACKEND=processes)."""
    from itertools import count

    from locov_tpu.data.loader import _process_map

    vals = list(range(37))
    out = list(_process_map(lambda r: r * r, vals, range(37), workers=2))
    assert out == [i * i for i in range(37)]

    def boom(r):
        if r == 5:
            raise ValueError("boom")
        return r

    with pytest.raises(ValueError, match="boom"):
        list(_process_map(boom, vals, range(10), workers=2))

    pulled = []

    def src():
        for i in count():
            pulled.append(i % 37)
            yield i % 37

    it = _process_map(lambda r: r, vals, src(), workers=2)
    got = [next(it) for _ in range(20)]
    assert got == [i % 37 for i in range(20)]
    assert len(pulled) <= 20 + 2 * 4 + 1  # window = workers * 4


def test_process_map_reseeds_forked_workers():
    """fork duplicates the mapper RNG into every worker; _proc_init must
    reseed per-pid or all workers draw identical augmentation streams."""
    import random
    import time as _time

    from locov_tpu.data.loader import _process_map

    class DrawMapper:
        def __init__(self):
            self.rng = random.Random(0)
            self.first = None

        def __call__(self, r):
            _time.sleep(0.002)  # encourage both workers to take tasks
            if self.first is None:
                self.first = self.rng.random()
            return (os.getpid(), self.first)

    out = list(_process_map(DrawMapper(), list(range(40)), range(40),
                            workers=2))
    first_by_pid = {}
    for pid, draw in out:
        first_by_pid.setdefault(pid, draw)
    if len(first_by_pid) >= 2:  # both workers participated
        draws = list(first_by_pid.values())
        assert len(set(draws)) == len(draws), (
            "forked workers produced identical RNG streams")


def test_loader_process_backend_matches_serial(tmp_path, rng):
    """processes backend must be byte-identical to the serial path for a
    deterministic (eval) mapper."""
    root = str(tmp_path)
    make_micro_coco(root, n_val=5)
    from locov_tpu.data import DatasetCatalog, MetadataCatalog
    from locov_tpu.data.datasets.coco import register_dataset
    from locov_tpu.data.mappers import DetectionMapper
    for name in list(DatasetCatalog._registry):
        DatasetCatalog.remove(name)
    for name in list(MetadataCatalog._store):
        MetadataCatalog.remove(name)
    register_dataset("coco_zeroshot_val", root)
    records = DatasetCatalog.get("coco_zeroshot_val")
    meta = MetadataCatalog.get("coco_zeroshot_val")
    cfg = micro_cfg(root, "OvrRCNN")
    mapper = DetectionMapper(cfg, meta, is_train=False, seed=0)

    def batches(workers, backend):
        loader = DataLoader(records, mapper,
                            InferenceSampler(len(records)),
                            batch_size=2, buckets=[(96, 96)], gt_slots=8,
                            has_text=False, is_train=False,
                            num_workers=workers, worker_backend=backend)
        return list(loader)

    serial = batches(0, "threads")
    forked = batches(2, "processes")
    assert len(serial) == len(forked)
    import jax
    for a, b in zip(serial, forked):
        la = jax.tree_util.tree_leaves(a)
        lb = jax.tree_util.tree_leaves(b)
        assert len(la) == len(lb)
        for x, y in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    with pytest.raises(ValueError, match="WORKER_BACKEND"):
        DataLoader(records, mapper, InferenceSampler(len(records)),
                   batch_size=2, buckets=[(96, 96)], gt_slots=8,
                   has_text=False, is_train=False, num_workers=2,
                   worker_backend="greenlets")


def test_process_workers_deterministic_and_rank_dependent():
    """ADVICE r3: worker seeds must derive from (cfg seed, host rank,
    worker index) — not the pid — so a fixed SEED reproduces identical
    streams across runs and different hosts draw different streams."""
    import random

    from locov_tpu.data.loader import _process_map

    class DrawMapper:
        seed = 0

        def __init__(self):
            self.rng = random.Random(0)

        def __call__(self, r):
            return self.rng.random()

    def draws(seed_base):
        return list(_process_map(DrawMapper(), list(range(8)), range(8),
                                 workers=2, seed_base=seed_base))

    a, b = draws(123), draws(123)
    # ordered equality: per-TASK seeding makes each record's draws
    # independent of the racy task->worker assignment
    assert a == b, "same seed_base must reproduce the same streams"
    c = draws(456)
    assert a != c, "different seed_base must change the streams"
    assert len(set(a)) == len(a), "tasks must not share RNG draws"


def test_dataloader_eager_pool_and_close(tmp_path, rng):
    """The fork pool is created at construction (before any prefetch
    thread exists) and close() terminates it deterministically."""
    root = str(tmp_path)
    make_micro_coco(root, n_val=4)
    from locov_tpu.data import DatasetCatalog, MetadataCatalog
    from locov_tpu.data.datasets.coco import register_dataset
    from locov_tpu.data.mappers import DetectionMapper
    for name in list(DatasetCatalog._registry):
        DatasetCatalog.remove(name)
    for name in list(MetadataCatalog._store):
        MetadataCatalog.remove(name)
    register_dataset("coco_zeroshot_val", root)
    records = DatasetCatalog.get("coco_zeroshot_val")
    meta = MetadataCatalog.get("coco_zeroshot_val")
    cfg = micro_cfg(root, "OvrRCNN")
    mapper = DetectionMapper(cfg, meta, is_train=False, seed=0)
    assert mapper.seed == 0  # stored (was silently dropped pre-r4)

    loader = DataLoader(records, mapper, InferenceSampler(len(records)),
                        batch_size=2, buckets=[(96, 96)], gt_slots=8,
                        has_text=False, is_train=False, num_workers=2,
                        worker_backend="processes", seed=7, rank=0)
    assert loader._pool is not None, "pool must be created eagerly"
    worker_pids = [p.pid for p in loader._pool._pool]
    batches = list(loader)
    assert len(batches) == 2
    loader.close()
    assert loader._pool is None
    import time as _time
    deadline = _time.time() + 10
    while _time.time() < deadline:
        if all(not _pid_alive(p) for p in worker_pids):
            break
        _time.sleep(0.05)
    assert all(not _pid_alive(p) for p in worker_pids), \
        "close() must terminate the worker processes"
    # reusable after close: the pool is lazily recreated
    again = list(loader)
    assert len(again) == 2
    loader.close()


def _pid_alive(pid):
    try:
        os.kill(pid, 0)
        return True
    except OSError:
        return False

"""OVRTrainer: build-everything orchestration + train loop + hooks.

Behavioral port of the reference trainer
(``ovr/engine/trainer.py:37-566``): builds model / optimizer / loaders,
runs the custom loop with init-eval (trainer.py:104-107), the hook
schedule (timer, LR record, periodic checkpointer max_to_keep=2,
EvalHook with best-metric save, periodic writers, trainer.py:220-291),
per-dataset class-embedding (re)loading (trainer.py:365-407), resume
with the key-rename fan-out map for the LSM->STT hand-off
(trainer.py:293-363), cross-rank metric reduction (here a pmean inside
the jitted step) and the NaN -> FloatingPointError tripwire
(trainer.py:554-559).
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import DatasetCatalog, MetadataCatalog, get_register_dataset
from ..data.loader import (DataLoader, InferenceSampler, TrainingSampler,
                           derive_buckets)
from ..data.mappers import DetectionMapper
from ..data.tokenization import WordPieceTokenizer, build_tiny_vocab
from ..evaluation.evaluator import (inference_on_caption_dataset,
                                    inference_on_detection_dataset,
                                    select_evaluator_type)
from ..models import build_meta_arch
from ..parallel import (DevicePrefetcher, get_mesh, make_eval_step,
                        make_loss_eval_step,
                        make_train_step, shard_batch)
from ..utils.checkpoint import (Checkpointer, STT_FROM_LSM_RENAME,
                                convert_caffe2_resnet,
                                convert_d2_state_dict, flatten_params,
                                load_torch_file, load_with_rename_map,
                                unflatten_params)
from ..utils.events import (CSVWriter, EventStorage, JSONWriter,
                            MetricPrinter, TensorboardWriter)
from .solver import build_optimizer, default_frozen_fn

logger = logging.getLogger(__name__)

LSM_ARCHS = {"DistillProposalMMSSRCNN", "DistillOnlyProposalMMSSRCNN",
             "MMSSGridModel", "DistillMMSSGridModel"}


def proposal_slots(cfg) -> int:
    """Static proposal-slot count for the RPN-less PrecomputedProposals
    path (reference ovr_rcnn.py:59-61); 0 keeps DetectionBatch.proposals
    empty on the RPN path. Module-level (not a trainer method) so eval
    harnesses that borrow the loader builders get it too."""
    if cfg.MODEL.PROPOSAL_GENERATOR.NAME != "PrecomputedProposals":
        return 0
    if not cfg.MODEL.LOAD_OBJ_PROPOSALS:
        raise ValueError(
            "MODEL.PROPOSAL_GENERATOR.NAME='PrecomputedProposals' "
            "requires MODEL.LOAD_OBJ_PROPOSALS=True so the data "
            "pipeline can attach the OLN proposals as model inputs.")
    return cfg.TPU.MAX_PRECOMPUTED_PROPOSALS


def build_tokenizer(cfg) -> Optional[WordPieceTokenizer]:
    path = cfg.MODEL.LANGUAGE_BACKBONE.VOCAB_PATH
    if path and os.path.exists(path):
        return WordPieceTokenizer.from_vocab_file(path)
    default = os.path.join(cfg.DATASETS.ROOT,
                           "datasets_data/bert/vocab.txt")
    if os.path.exists(default):
        return WordPieceTokenizer.from_vocab_file(default)
    logger.warning("No BERT vocab file found; using a tiny synthetic "
                   "vocab (set MODEL.LANGUAGE_BACKBONE.VOCAB_PATH).")
    return WordPieceTokenizer(build_tiny_vocab(["a", "photo", "of"]))


class OVRTrainer:
    def __init__(self, cfg):
        from ..config import auto_scale_workers
        cfg = auto_scale_workers(cfg, jax.process_count())
        self.cfg = cfg
        if cfg.TPU.DEBUG_NANS:
            from ..utils.debug import enable_nan_debugging
            enable_nan_debugging()
        self.mesh = get_mesh()
        self.is_lsm = cfg.MODEL.META_ARCHITECTURE in LSM_ARCHS
        self.needs_text = self.is_lsm

        self.model = build_meta_arch(cfg)
        self.tokenizer = build_tokenizer(cfg) if self.needs_text else None
        self.train_loader = self.build_train_loader(cfg)
        self._train_iter = iter(self.train_loader)
        if cfg.TPU.PREFETCH_BATCHES > 0:
            # host decode/collate + host->device copy overlap with the
            # device step (one-batch-ahead pipeline)
            self._train_iter = DevicePrefetcher(
                self._train_iter, self.mesh,
                depth=cfg.TPU.PREFETCH_BATCHES)

        # class embeddings for the TRAIN vocabulary (trainer.py:365-407)
        self.class_emb = self.load_embeddings(cfg.DATASETS.TRAIN[0])

        # init params from one real batch
        first = next(self._train_iter)
        self._first_batch = first
        rng = jax.random.PRNGKey(max(cfg.SEED, 0))
        self.rng = rng
        logger.info("Initializing model parameters...")
        self.params = jax.jit(
            lambda b, c, k: self.model.init(k, b, c, k,
                                            method=self.model.losses)
        )(first, self.class_emb, rng)
        n_params = sum(x.size for x in jax.tree.leaves(self.params))
        logger.info("Model has %.1fM parameters", n_params / 1e6)

        self.checkpointer = Checkpointer(
            cfg.OUTPUT_DIR, max_to_keep=2,
            use_async=cfg.TPU.ASYNC_CHECKPOINT)
        if cfg.MODEL.WEIGHTS:
            self.load_pretrained(cfg.MODEL.WEIGHTS)
        if cfg.MODEL.PROJECTION_WEIGHTS:
            self.load_projection_only(cfg.MODEL.PROJECTION_WEIGHTS)

        frozen_fn = default_frozen_fn(cfg)
        self.optimizer, self.schedule = build_optimizer(
            cfg, self.params, frozen_fn=frozen_fn)
        self.opt_state = self.optimizer.init(self.params)

        self.train_step = make_train_step(
            self.model, self.optimizer, self.mesh,
            contrastive_scope=cfg.TPU.CONTRASTIVE_SCOPE)
        self._eval_step = None
        self._loss_eval_step = None

        self.start_iter = 0
        self.max_iter = cfg.SOLVER.MAX_ITER
        self.storage = EventStorage(0)
        self.writers = [
            MetricPrinter(self.max_iter, logger=logger.info),
            JSONWriter(os.path.join(cfg.OUTPUT_DIR, "metrics.json")),
            CSVWriter(os.path.join(cfg.OUTPUT_DIR, "metrics.csv"),
                      epoch_size=cfg.SOLVER.EPOCH_ITER_SIZE),
            TensorboardWriter(cfg.OUTPUT_DIR),
        ]
        self._best_metric = None

    # ------------------------------------------------------------ builders
    def build_train_loader(self, cfg) -> DataLoader:
        name = cfg.DATASETS.TRAIN[0]
        get_register_dataset(name)(name, cfg.DATASETS.ROOT)
        records = DatasetCatalog.get(name)
        meta = MetadataCatalog.get(name)
        mapper = DetectionMapper(
            cfg, meta, is_train=True, tokenizer=self.tokenizer,
            mlm=cfg.MODEL.MMSS_HEAD.TRANSFORMER.MASKED_LANGUAGE_MODELING,
            seed=max(cfg.SEED, 0))
        sampler = TrainingSampler(len(records), seed=max(cfg.SEED, 0),
                                  rank=jax.process_index(),
                                  world_size=jax.process_count())
        buckets = (tuple(cfg.TPU.IMAGE_BUCKETS)
                   if cfg.TPU.IMAGE_BUCKETS else
                   derive_buckets(cfg, True))
        gt_slots = (cfg.TPU.MAX_PRECOMPUTED_PROPOSALS
                    if cfg.MODEL.LOAD_OBJ_PROPOSALS
                    else cfg.TPU.MAX_GT_BOXES)
        per_host = cfg.SOLVER.IMS_PER_BATCH // jax.process_count()
        return DataLoader(records, mapper, sampler, per_host, buckets,
                          gt_slots, has_text=self.needs_text,
                          is_train=True,
                          num_workers=cfg.DATALOADER.NUM_WORKERS,
                          worker_backend=cfg.DATALOADER.WORKER_BACKEND,
                          seed=max(cfg.SEED, 0),
                          rank=jax.process_index(),
                          proposal_slots=proposal_slots(cfg))

    def build_test_loader(self, cfg, dataset_name: str,
                          val: bool = False) -> DataLoader:
        """Test loader (TEST.IMS_PER_BATCH) or validation-loss loader
        (SOLVER.IMS_PER_BATCH // world, the reference's
        build_detection_val_loader, dataloader.py:66-121)."""
        get_register_dataset(dataset_name)(dataset_name, cfg.DATASETS.ROOT)
        records = DatasetCatalog.get(dataset_name)
        meta = MetadataCatalog.get(dataset_name)
        mapper = DetectionMapper(cfg, meta, is_train=False,
                                 tokenizer=self.tokenizer,
                                 mlm=False, seed=0)
        sampler = InferenceSampler(len(records),
                                   rank=jax.process_index(),
                                   world_size=jax.process_count())
        buckets = derive_buckets(cfg, False)
        if val:
            bs = max(cfg.SOLVER.IMS_PER_BATCH // jax.process_count(), 1)
        else:
            bs = max(cfg.TEST.IMS_PER_BATCH, 1)
        # eval batches shard over the local mesh: round up to a multiple
        # of the local device count (reference configs use
        # TEST.IMS_PER_BATCH=1, which a multi-chip mesh can't split)
        ndev = jax.local_device_count()
        bs = ((bs + ndev - 1) // ndev) * ndev
        return DataLoader(records, mapper, sampler, bs, buckets,
                          cfg.TPU.MAX_GT_BOXES,
                          has_text=self.needs_text, is_train=False,
                          num_workers=cfg.DATALOADER.NUM_WORKERS,
                          worker_backend=cfg.DATALOADER.WORKER_BACKEND,
                          seed=0, rank=jax.process_index(),
                          proposal_slots=proposal_slots(cfg))

    def load_embeddings(self, dataset_name: str) -> jnp.ndarray:
        """Fetch the class-embedding matrix registered for a dataset and
        (at eval) swap the classifier vocabulary (trainer.py:365-407).
        Falls back to random embeddings when the embedding JSON is not
        on disk (smoke/test runs)."""
        get_register_dataset(dataset_name)(dataset_name,
                                           self.cfg.DATASETS.ROOT)
        meta = MetadataCatalog.get(dataset_name)
        mtx = meta.get("class_emb_mtx")
        if mtx is None:
            k = len(meta.get("thing_classes", [])) + 1
            logger.warning("No class embeddings for %s; using random",
                           dataset_name)
            mtx = np.random.RandomState(0).randn(
                k, self.cfg.MODEL.ROI_BOX_HEAD.EMB_DIM).astype(np.float32)
            mtx[-1] = 0.0
        return jnp.asarray(mtx)

    # ---------------------------------------------------------- checkpoints
    def load_pretrained(self, weights: str):
        """Load MODEL.WEIGHTS: torch .pth / Caffe2 .pkl / our orbax.

        Orbax checkpoints of a DIFFERENT meta-arch (the LSM -> STT stage
        hand-off) go through the rename fan-out map, exactly like the
        reference's resume_or_load_renaming_keys (trainer.py:293-363):
        LSM's roi_heads/res5 seeds both backbone/res5 and the STT
        roi_heads/res5, and the tied v2l projection seeds emb_pred."""
        if not os.path.exists(weights):
            logger.warning("MODEL.WEIGHTS %s not found; training from "
                           "scratch", weights)
            return
        flat_dst = flatten_params(self.params["params"])
        if weights.endswith((".pth", ".pkl")):
            state = load_torch_file(weights)
            flat_src = convert_caffe2_resnet(state) \
                if weights.endswith(".pkl") else convert_d2_state_dict(state)
        else:
            state = self.checkpointer.load(weights)
            src_params = state["params"] if "params" in state else state
            if "params" in src_params:  # {'params': {'params': ...}}
                src_params = src_params["params"]
            flat_src = flatten_params(src_params)
        same_arch = set(flat_src) == set(flat_dst)
        rename = {} if same_arch else STT_FROM_LSM_RENAME
        merged, report = load_with_rename_map(flat_src, flat_dst, rename)
        logger.info("Import from %s%s: %s", weights,
                    "" if same_arch else " (stage-transfer rename map)",
                    report.summary())
        # persist the full import report — the day-1 parity runbook
        # checks it before trusting any AP number (README)
        self.last_import_report = report
        try:
            with open(os.path.join(self.cfg.OUTPUT_DIR,
                                   "import_report.json"), "w") as f:
                json.dump({"weights": weights,
                           "loaded": report.loaded,
                           "missing": report.missing,
                           "mismatched": [list(m) for m in
                                          report.mismatched],
                           "unused_src": report.unused_src}, f, indent=1)
        except OSError:
            pass
        self.params = {**self.params, "params": unflatten_params(merged)}

    def load_projection_only(self, weights: str):
        """Load ONLY the V->L projection (v2l_projection / emb_pred)
        from a checkpoint (reference WSOGCheckpointer projection-only
        load, checkpoint.py:119-183)."""
        if not os.path.exists(weights):
            logger.warning("PROJECTION_WEIGHTS %s not found", weights)
            return
        if weights.endswith((".pth", ".pkl")):
            flat_src = convert_d2_state_dict(load_torch_file(weights))
        else:
            state = self.checkpointer.load(weights)
            src = state["params"] if "params" in state else state
            if "params" in src:
                src = src["params"]
            flat_src = flatten_params(src)
        proj = {k: v for k, v in flat_src.items()
                if "v2l_projection" in k or "emb_pred" in k}
        flat_dst = flatten_params(self.params["params"])
        merged, _ = load_with_rename_map(proj, flat_dst,
                                         STT_FROM_LSM_RENAME)
        logger.info("Loaded projection-only weights (%d source keys) "
                    "from %s", len(proj), weights)
        self.params = {**self.params, "params": unflatten_params(merged)}

    def resume_or_load(self, resume: bool):
        """Resume from last_checkpoint, else load MODEL.WEIGHTS with the
        stage-transfer rename fan-out (trainer.py:293-363)."""
        if resume and self.checkpointer.has_checkpoint():
            name = self.checkpointer.last_checkpoint()
            state = self.checkpointer.load(name)
            # merge over the init template (not wholesale replace) so
            # model statistics added AFTER the checkpoint was written
            # (e.g. quant/roialign_amax) keep their zero init and read
            # as uncalibrated instead of erroring as missing variables
            from ..utils.checkpoint import merge_over_template
            self.params = merge_over_template(
                self.params, jax.tree.map(jnp.asarray, state["params"]))
            # orbax restores NamedTuples as plain dicts — rebuild the
            # optimizer-state structure (SGDState, or MultiStepsState
            # when SOLVER.GRADIENT_ACCUMULATION_STEPS > 1) against a
            # freshly-initialized template
            restored = state.get("opt_state")
            if restored is not None:
                from .solver import restore_opt_state
                self.opt_state = restore_opt_state(
                    restored, self.optimizer.init(self.params))
            self.start_iter = self.checkpointer.resume_iteration(name)
            self.storage.iter = self.start_iter
            logger.info("Resumed from %s at iter %d", name,
                        self.start_iter)
        elif self.cfg.MODEL.WEIGHTS and os.path.exists(
                self.cfg.MODEL.WEIGHTS) and \
                self.cfg.MODEL.WEIGHTS.endswith((".pth", ".pkl")):
            # stage hand-off: apply the rename fan-out map
            state = load_torch_file(self.cfg.MODEL.WEIGHTS)
            flat_src = convert_d2_state_dict(state)
            flat_dst = flatten_params(self.params["params"])
            merged, _ = load_with_rename_map(flat_src, flat_dst,
                                             STT_FROM_LSM_RENAME)
            self.params = {**self.params,
                           "params": unflatten_params(merged)}

    # ---------------------------------------------------------------- train
    def _next_batch(self):
        batch = self._first_batch if self._first_batch is not None \
            else next(self._train_iter)
        self._first_batch = None
        return batch

    def run_step(self):
        """One training step with an ASYNC metrics pipeline: the step
        for iteration t is dispatched, then the metrics of iteration
        t-1 (already finished on device) are pulled to host. The host
        never blocks on the step it just dispatched, so device steps
        overlap with metric transfer/logging — without this, every
        step pays a full device->host sync (the reference blocks every
        step at trainer.py:519-563; on TPU that sync is the single
        biggest throughput killer). The NaN tripwire
        (FloatingPointError, trainer.py:554-559) fires one step late."""
        start = time.perf_counter()
        batch = self._next_batch()
        data_time = time.perf_counter() - start

        self.rng, k = jax.random.split(self.rng)
        batch = shard_batch(batch, self.mesh)
        self.params, self.opt_state, metrics = self.train_step(
            self.params, self.opt_state, batch, self.class_emb, k)

        pending = getattr(self, "_pending_metrics", None)
        self._pending_metrics = (metrics, self.storage.iter)
        if pending is not None:
            self._record_metrics(*pending)

        self.storage.put_scalar("data_time", data_time)
        self.storage.put_scalar("time", time.perf_counter() - start)
        self.storage.put_scalar(
            "lr", float(self.schedule(self.storage.iter)))

    def _record_metrics(self, metrics, iteration: int):
        metrics = {k2: float(v) for k2, v in metrics.items()}
        total = metrics.get("total_loss", 0.0)
        if not np.isfinite(total):
            bad = {k2: v for k2, v in metrics.items()
                   if not np.isfinite(v)}
            raise FloatingPointError(
                f"Loss became infinite or NaN at iteration="
                f"{iteration}! Bad metrics: {bad}")
        for k2, v in metrics.items():
            self.storage.put_scalar(k2, v)

    def flush_metrics(self):
        pending = getattr(self, "_pending_metrics", None)
        if pending is not None:
            self._record_metrics(*pending)
            self._pending_metrics = None
        # device-memory telemetry (the reference prints GPUtil stats for
        # iters 100-300, trainer.py:111-112; we log HBM continuously)
        try:
            stats = jax.local_devices()[0].memory_stats()
            if stats and "bytes_in_use" in stats:
                self.storage.put_scalar(
                    "device_mem_gb", stats["bytes_in_use"] / 2 ** 30)
        except Exception:
            pass

    def train(self):
        cfg = self.cfg
        logger.info("Starting training from iteration %d", self.start_iter)
        try:
            if cfg.TEST.EVAL_INIT and self.start_iter == 0:
                self.test_and_maybe_save()
            prof_dir = cfg.TPU.PROFILE_DIR
            for it in range(self.start_iter, self.max_iter):
                self.storage.iter = it
                if prof_dir and it == cfg.TPU.PROFILE_START:
                    jax.profiler.start_trace(prof_dir)
                self.run_step()
                if prof_dir and it == cfg.TPU.PROFILE_STOP:
                    self.flush_metrics()
                    jax.profiler.stop_trace()
                self.after_step(it)
            self.flush_metrics()
            # final checkpoint + eval
            self.checkpointer.save_named(
                "model_final", {"params": self.params,
                                "opt_state": self.opt_state,
                                "iteration": self.max_iter - 1})
            results = self.test_and_maybe_save(final=True)
            # commit the in-flight async save (it overlapped the eval)
            self.checkpointer.wait()
            return results
        finally:
            # deterministic worker-pool teardown (ADVICE r3): an
            # abandoned loader otherwise leaks its worker processes
            # until GC
            self.train_loader.close()

    def after_step(self, it: int):
        cfg = self.cfg
        if (it + 1) % cfg.SOLVER.CHECKPOINT_PERIOD == 0:
            self.checkpointer.save_periodic(
                it, {"params": self.params, "opt_state": self.opt_state,
                     "iteration": it})
        if cfg.TEST.EVAL_PERIOD > 0 and (it + 1) % cfg.TEST.EVAL_PERIOD \
                == 0 and it + 1 != self.max_iter:
            self.test_and_maybe_save()
        if (it + 1) % cfg.SOLVER.LOG_PERIOD == 0:
            for w in self.writers:
                w.write(self.storage)

    # ----------------------------------------------------------------- test
    def _get_eval_steps(self):
        if self._eval_step is None:
            self._eval_step = make_eval_step(self.model, self.mesh)
        if self._loss_eval_step is None and self.needs_text:
            self._loss_eval_step = make_loss_eval_step(self.model,
                                                       self.mesh)
        return self._eval_step, self._loss_eval_step

    def test_and_maybe_save(self, final: bool = False) -> Dict:
        results = self.test(self.cfg)
        # best-metric tracking (trainer.py:246-265, checkpoint.py:186-234)
        metric_key = self.cfg.TEST.SAVE_MODEL_BEST_METRIC
        flat = {}
        for ds, res in results.items():
            for k, v in res.items():
                flat[f"{ds}/bbox/{k}"] = v
                self.storage.put_scalar(f"{ds}/{k}", v) \
                    if isinstance(v, (int, float)) else None
        value = flat.get(metric_key)
        if value is not None and (self._best_metric is None
                                  or value > self._best_metric):
            self._best_metric = value
            self.checkpointer.save_best(
                self.storage.iter, {"params": self.params,
                                    "opt_state": self.opt_state,
                                    "iteration": self.storage.iter},
                metric_key, value)
        return results

    def _maybe_calibrate_int8(self, cfg, dataset_name, class_emb):
        """Static int8 serving (TPU.INT8_SCHEME='static'): before the
        first inference pass, run ``calibrate_int8`` over a few batches
        to fill the ``quant`` collection with per-conv activation
        maxima (PERF.md: static scales are the winning scheme; dynamic
        ones lose to unfused quantize traffic). The collection merges
        into ``self.params`` and thus persists through checkpoints."""
        if not (cfg.TPU.INT8_EVAL and cfg.TPU.INT8_SCHEME == "static"
                and hasattr(self.model, "calibrate_int8")):
            return
        quant = self.params.get("quant")
        # Positivity over ALL leaves is a sound calibration check
        # because every load path merges restored state over the init
        # template (merge_over_template): a statistic the model gained
        # after an old checkpoint was calibrated (e.g. roialign_amax)
        # is guaranteed present with its zero init -> recalibrates here.
        if quant is not None and all(
                float(jnp.max(a)) > 0 for a in jax.tree.leaves(quant)):
            return  # already calibrated (this run or via checkpoint)
        from ..parallel import make_calibrate_step
        step = make_calibrate_step(self.model, self.mesh)
        loader = self.build_test_loader(cfg, dataset_name)
        n = max(1, cfg.TPU.INT8_CALIB_BATCHES)
        logger.info("Calibrating int8 activation scales on %d batches "
                    "of %s...", n, dataset_name)
        try:
            for idx, batch in enumerate(loader):
                if idx >= n:
                    break
                quant = step(self.params, batch, class_emb)
                self.params = {**self.params, "quant": quant}
        finally:
            loader.close()

    def test(self, cfg) -> Dict[str, Dict]:
        eval_step, loss_step = self._get_eval_steps()
        results = {}
        for dataset_name in cfg.DATASETS.TEST:
            etype = select_evaluator_type(cfg, dataset_name)
            loader = self.build_test_loader(cfg, dataset_name)
            class_emb = self.load_embeddings(dataset_name)
            self._maybe_calibrate_int8(cfg, dataset_name, class_emb)
            res = {}
            if etype in ("ovr", "loss_and_coco", "loss_and_lvis") and \
                    cfg.TEST.DO_EVAL and loss_step is not None:
                metrics, losses = inference_on_caption_dataset(
                    loss_step, self.params, loader, class_emb, self.rng)
                res.update(metrics)
                res.update(losses)
            if etype != "ovr":
                if cfg.TEST.AUG.ENABLED:
                    from ..evaluation.tta import (build_tta_loaders,
                                                  inference_with_tta)
                    det = inference_with_tta(
                        eval_step, self.params,
                        build_tta_loaders(self, cfg, dataset_name),
                        class_emb, dataset_name,
                        cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
                        cfg.TEST.DETECTIONS_PER_IMAGE, etype=etype)
                else:
                    det = inference_on_detection_dataset(
                        eval_step, self.params, loader, class_emb,
                        dataset_name, etype=etype)
                res.update(det)
            loader.close()
            results[dataset_name] = res
            logger.info("Results for %s: %s", dataset_name,
                        {k: round(v, 3) for k, v in res.items()
                         if isinstance(v, float) and "-" not in k})
        return results

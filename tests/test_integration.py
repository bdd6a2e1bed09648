"""Full-pipeline integration tests on a synthetic micro-COCO dataset:
trainer build -> 2 train steps -> checkpoint -> eval, for both stages,
on the 8-device CPU mesh (so shard_map/psum paths are exercised)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from fixtures import make_micro_coco, micro_cfg  # noqa: E402

pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def micro_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("micro_coco"))
    make_micro_coco(root)
    return root


def _fresh_catalogs():
    from locov_tpu.data import DatasetCatalog, MetadataCatalog
    for name in list(DatasetCatalog._registry):
        DatasetCatalog.remove(name)
    for name in list(MetadataCatalog._store):
        MetadataCatalog.remove(name)


def test_stt_train_and_eval(micro_root):
    _fresh_catalogs()
    from locov_tpu.engine.trainer import OVRTrainer

    cfg = micro_cfg(micro_root, "OvrRCNN")
    cfg.DATASETS.TRAIN = ("coco_zeroshot_train",)
    cfg.DATASETS.TEST = ("coco_zeroshot_val",)
    cfg.freeze()

    trainer = OVRTrainer(cfg)
    trainer.resume_or_load(resume=False)
    p0 = float(np.abs(np.asarray(
        trainer.params["params"]["roi_heads"]["box_predictor"]
        ["bbox_pred"]["kernel"])).sum())
    results = trainer.train()

    # params changed
    p1 = float(np.abs(np.asarray(
        trainer.params["params"]["roi_heads"]["box_predictor"]
        ["bbox_pred"]["kernel"])).sum())
    assert p0 != p1
    # eval produced COCO metrics
    res = results["coco_zeroshot_val"]
    assert "AP" in res and "AP50" in res
    assert np.isfinite(res["AP"])
    # checkpoints written
    assert trainer.checkpointer.has_checkpoint()
    assert os.path.exists(os.path.join(cfg.OUTPUT_DIR, "metrics.json"))

    # resume path: a fresh trainer restores iteration from checkpoint
    # AND can continue training (opt_state structure round-trips)
    trainer2 = OVRTrainer(cfg)
    trainer2.resume_or_load(resume=True)
    assert trainer2.start_iter == cfg.SOLVER.MAX_ITER
    trainer2.run_step()
    trainer2.flush_metrics()
    assert np.isfinite(trainer2.storage.histories()["total_loss"].latest)


def test_stt_int8_static_eval(micro_root):
    """Eval-only flow with TPU.INT8_EVAL + static scheme: the trainer
    auto-calibrates the quant collection before the first eval pass,
    the eval produces finite COCO metrics, and checkpoints written
    after calibration carry the quant collection."""
    _fresh_catalogs()
    from locov_tpu.engine.trainer import OVRTrainer

    cfg = micro_cfg(micro_root, "OvrRCNN")
    cfg.DATASETS.TRAIN = ("coco_zeroshot_train",)
    cfg.DATASETS.TEST = ("coco_zeroshot_val",)
    cfg.OUTPUT_DIR = os.path.join(micro_root, "output_int8")
    cfg.TPU.INT8_EVAL = True
    cfg.TPU.INT8_SCHEME = "static"
    cfg.TPU.INT8_CALIB_BATCHES = 1
    cfg.freeze()

    trainer = OVRTrainer(cfg)
    import jax
    # setup-declared quant vars exist from init but start at zero
    pre = jax.tree_util.tree_leaves(trainer.params.get("quant", {}))
    assert all(float(jax.numpy.max(a)) == 0 for a in pre)
    results = trainer.test(cfg)
    amaxes = jax.tree_util.tree_leaves(trainer.params["quant"])
    assert all(float(a) > 0 for a in amaxes)  # auto-calibrated
    res = results["coco_zeroshot_val"]
    assert "AP" in res and np.isfinite(res["AP"])
    # the quant collection round-trips through a checkpoint
    trainer.checkpointer.save_named(
        "model_final", {"params": trainer.params, "iteration": 0})
    state = trainer.checkpointer.load("model_final")
    assert "quant" in state["params"]
    restored = jax.tree_util.tree_leaves(state["params"]["quant"])
    np.testing.assert_allclose(
        np.asarray(sorted(float(a) for a in restored)),
        np.asarray(sorted(float(a) for a in amaxes)))


def test_lsm_train_step(micro_root):
    _fresh_catalogs()
    from locov_tpu.engine.trainer import OVRTrainer

    cfg = micro_cfg(micro_root, "DistillProposalMMSSRCNN")
    cfg.DATASETS.TRAIN = ("coco_captions_train_seen_proposals",)
    cfg.DATASETS.TEST = ()
    cfg.MODEL.LOAD_OBJ_PROPOSALS = True
    cfg.MODEL.LOAD_EMB_PRED_FROM_MMSS_HEAD = True
    cfg.MODEL.LANGUAGE_BACKBONE.TYPE = "build_bertemb_backbone"
    cfg.MODEL.LANGUAGE_BACKBONE.BERT_CONFIG.vocab_size = 200
    cfg.MODEL.LANGUAGE_BACKBONE.BERT_CONFIG.hidden_size = 16
    cfg.MODEL.LANGUAGE_BACKBONE.BERT_CONFIG.num_hidden_layers = 2
    cfg.MODEL.LANGUAGE_BACKBONE.BERT_CONFIG.num_attention_heads = 2
    cfg.MODEL.LANGUAGE_BACKBONE.BERT_CONFIG.intermediate_size = 32
    cfg.MODEL.MMSS_HEAD.TYPES = ("GroundingHead", "TransformerHead")
    cfg.MODEL.MMSS_HEAD.TIE_VL_PROJECTION_WEIGHTS = True
    cfg.MODEL.MMSS_HEAD.DISTILLATION_LOSS = True
    cfg.MODEL.MMSS_HEAD.DISTILLATION_TEACHER_TRANSFORMER = False
    cfg.MODEL.MMSS_HEAD.SPATIAL_DROPOUT = 6
    cfg.MODEL.MMSS_HEAD.TRANSFORMER.MASKED_LANGUAGE_MODELING = True
    cfg.MODEL.MMSS_HEAD.TRANSFORMER.MMM_LOSS = "cross_entropy"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.ROI_HEADS.DETACH_CLASS_PREDICTOR = True
    cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION = 1.0
    cfg.freeze()

    trainer = OVRTrainer(cfg)
    trainer.run_step()
    trainer.flush_metrics()  # metrics are pipelined one step behind
    hist = trainer.storage.histories()
    _check_lsm_metrics(hist)
    _check_lsm_eval(trainer, cfg)


def _check_lsm_eval(trainer, cfg):
    """loss_and_coco eval: loss-only pass + detection metrics on a
    caption+detection test set (reference evaluator.py:83-92)."""
    cfg.defrost()
    cfg.DATASETS.TEST = ("coco_captions_val",)
    cfg.TEST.IMS_PER_BATCH = 1  # must round up to the mesh size
    cfg.freeze()
    results = trainer.test(cfg)
    res = results["coco_captions_val"]
    assert "AP50" in res, sorted(res)[:10]
    assert any("CE_loss" in k for k in res), sorted(res)[:10]
    assert "Total Loss" in res
    for k, v in res.items():
        if isinstance(v, float) and "AP" not in k and "AR" not in k:
            assert np.isfinite(v), k


def _check_lsm_metrics(hist):
    for key in ["loss_rpn_cls", "loss_cls",
                "CE_loss (Align Words, Choose Caption)",
                "Masked Language Modeling Loss", "kd_loss",
                "box_kd_loss", "mixbox_kd_loss", "total_loss"]:
        assert key in hist, f"missing metric {key}"
        assert np.isfinite(hist[key].latest), key

"""LSM -> STT stage hand-off through our own checkpoints: the rename
fan-out must seed the STT detector's backbone/res5, roi_heads/res5 and
emb_pred from the LSM weights (reference trainer.py:293-363)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from fixtures import make_micro_coco, micro_cfg  # noqa: E402

pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def micro_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("micro_stage"))
    make_micro_coco(root)
    return root


def _fresh_catalogs():
    from locov_tpu.data import DatasetCatalog, MetadataCatalog
    for name in list(DatasetCatalog._registry):
        DatasetCatalog.remove(name)
    for name in list(MetadataCatalog._store):
        MetadataCatalog.remove(name)


def test_lsm_to_stt_stage_transfer(micro_root):
    from locov_tpu.engine.trainer import OVRTrainer
    from locov_tpu.utils.checkpoint import flatten_params

    # ---- stage 1: LSM, save a checkpoint
    _fresh_catalogs()
    cfg = micro_cfg(micro_root, "DistillProposalMMSSRCNN")
    cfg.DATASETS.TRAIN = ("coco_captions_train_seen_proposals",)
    cfg.DATASETS.TEST = ()
    cfg.MODEL.LOAD_OBJ_PROPOSALS = True
    cfg.MODEL.LOAD_EMB_PRED_FROM_MMSS_HEAD = True
    cfg.MODEL.LANGUAGE_BACKBONE.TYPE = "build_bertemb_backbone"
    for k, v in dict(vocab_size=200, hidden_size=16, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=32).items():
        setattr(cfg.MODEL.LANGUAGE_BACKBONE.BERT_CONFIG, k, v)
    cfg.MODEL.MMSS_HEAD.TYPES = ("GroundingHead",)
    cfg.MODEL.MMSS_HEAD.TIE_VL_PROJECTION_WEIGHTS = True
    cfg.MODEL.MMSS_HEAD.DISTILLATION_LOSS = False
    cfg.MODEL.MMSS_HEAD.SPATIAL_DROPOUT = 6
    cfg.MODEL.ROI_HEADS.DETACH_CLASS_PREDICTOR = True
    cfg.OUTPUT_DIR = os.path.join(micro_root, "lsm_out")
    cfg.freeze()
    lsm = OVRTrainer(cfg)
    lsm.checkpointer.save_named(
        "model_final", {"params": lsm.params, "iteration": 0})
    lsm_flat = flatten_params(lsm.params["params"])
    lsm_res5 = lsm_flat["roi_heads/res5/0/conv1/kernel"]
    lsm_v2l = lsm_flat["mmss_heads/v2l_projection/kernel"]

    # ---- stage 2: STT initialized from the LSM checkpoint
    _fresh_catalogs()
    cfg2 = micro_cfg(micro_root, "OvrRCNN")
    cfg2.DATASETS.TRAIN = ("coco_zeroshot_train",)
    cfg2.DATASETS.TEST = ()
    cfg2.MODEL.WEIGHTS = os.path.join(micro_root, "lsm_out",
                                      "model_final")
    cfg2.MODEL.ROI_BOX_HEAD.FREEZE_EMB_PRED = True
    cfg2.OUTPUT_DIR = os.path.join(micro_root, "stt_out")
    cfg2.freeze()
    stt = OVRTrainer(cfg2)
    stt_flat = flatten_params(stt.params["params"])

    np.testing.assert_allclose(
        np.asarray(stt_flat["roi_heads/res5/0/conv1/kernel"]),
        np.asarray(lsm_res5), rtol=1e-6,
        err_msg="STT roi_heads.res5 must inherit LSM res5")
    np.testing.assert_allclose(
        np.asarray(stt_flat["backbone/stem/conv1/kernel"]),
        np.asarray(lsm_flat["backbone/stem/conv1/kernel"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(stt_flat["roi_heads/box_predictor/emb_pred/kernel"]),
        np.asarray(lsm_v2l), rtol=1e-6,
        err_msg="STT emb_pred must inherit the LSM v2l projection")

"""Checkpointer tests: orbax round-trip, pruning, best-metric sidecar,
rename fan-out, torch-name conversion."""
import json
import os

import numpy as np
import jax.numpy as jnp

from locov_tpu.utils.checkpoint import (Checkpointer, STT_FROM_LSM_RENAME,
                                        convert_d2_state_dict,
                                        flatten_params,
                                        load_with_rename_map,
                                        merge_over_template,
                                        unflatten_params)


def _params():
    return {"params": {"a": {"w": jnp.arange(6.0).reshape(2, 3)},
                       "b": {"x": jnp.ones(4)}}}


def test_save_load_roundtrip(tmp_path):
    ck = Checkpointer(str(tmp_path), max_to_keep=2)
    state = {**_params(), "iteration": 7}
    ck.save_periodic(7, state)
    assert ck.has_checkpoint()
    name = ck.last_checkpoint()
    assert name == "model_0000007"
    loaded = ck.load(name)
    np.testing.assert_allclose(np.asarray(loaded["params"]["a"]["w"]),
                               np.arange(6.0).reshape(2, 3))
    assert ck.resume_iteration(name) == 8


def test_merge_over_template_new_quant_statistic():
    """A checkpoint calibrated before the model gained a quant
    statistic (e.g. roialign_amax) restores structure-complete: the
    new leaf keeps its zero init (-> reads as uncalibrated) instead of
    erroring as a missing variable; leaves the checkpoint has win."""
    template = {
        "params": {"a": {"w": jnp.zeros((2,))}},
        "quant": {"roi_heads": {"pooled_amax": jnp.zeros(()),
                                "roialign_amax": jnp.zeros(())}}}
    restored = {
        "params": {"a": {"w": jnp.ones((2,))}},
        "quant": {"roi_heads": {"pooled_amax": jnp.asarray(3.5)}},
        "batch_stats": {"m": jnp.asarray(1.0)}}  # only-in-restored
    out = merge_over_template(template, restored)
    np.testing.assert_allclose(np.asarray(out["params"]["a"]["w"]), 1.0)
    q = out["quant"]["roi_heads"]
    assert float(q["pooled_amax"]) == 3.5
    assert float(q["roialign_amax"]) == 0.0  # init survives -> recalib
    assert float(out["batch_stats"]["m"]) == 1.0
    # collection absent from the checkpoint entirely -> template's
    out2 = merge_over_template(template,
                               {"params": restored["params"]})
    assert float(
        out2["quant"]["roi_heads"]["pooled_amax"]) == 0.0


def test_max_to_keep_pruning(tmp_path):
    ck = Checkpointer(str(tmp_path), max_to_keep=2)
    for it in [1, 2, 3, 4]:
        ck.save_periodic(it, _params())
    ck.wait()  # commit the in-flight async save before inspecting disk
    names = sorted(n for n in os.listdir(tmp_path)
                   if n.startswith("model_0"))
    assert names == ["model_0000003", "model_0000004"]


def test_async_readers_barrier_on_pending_save(tmp_path):
    """Every reader must see the just-dispatched async save committed."""
    ck = Checkpointer(str(tmp_path), max_to_keep=2, use_async=True)
    ck.save_periodic(1, {**_params(), "iteration": 1})
    state2 = {"params": {"a": {"w": jnp.full((2, 3), 5.0)}},
              "iteration": 2}
    ck.save_periodic(2, state2)
    # last_checkpoint() barriers: the pointer reflects the second save
    assert ck.last_checkpoint() == "model_0000002"
    loaded = ck.load("model_0000002")
    np.testing.assert_allclose(np.asarray(loaded["params"]["a"]["w"]), 5.0)


def test_async_save_named_while_pending(tmp_path):
    """save_named (model_final/model_best) right after a periodic save
    must serialize with the in-flight save, not corrupt it."""
    ck = Checkpointer(str(tmp_path), use_async=True)
    ck.save_periodic(9, {**_params(), "iteration": 9})
    ck.save_named("model_final", {**_params(), "iteration": 9})
    ck.wait()
    assert os.path.isdir(tmp_path / "model_0000009")
    assert os.path.isdir(tmp_path / "model_final")
    # save_named never moves the pointer (d2 semantics)
    assert ck.last_checkpoint() == "model_0000009"


def test_sync_mode_roundtrip(tmp_path):
    ck = Checkpointer(str(tmp_path), use_async=False)
    ck.save_periodic(3, {**_params(), "iteration": 3})
    assert ck.last_checkpoint() == "model_0000003"
    loaded = ck.load("model_0000003")
    np.testing.assert_allclose(np.asarray(loaded["params"]["b"]["x"]), 1.0)


def test_best_metric_sidecar(tmp_path):
    ck = Checkpointer(str(tmp_path))
    ck.save_best(42, _params(), "coco_zeroshot_val/bbox/AP", 17.2)
    side = json.load(open(tmp_path / "model_best.json"))
    assert side["value"] == 17.2 and side["iteration"] == 42
    assert ck.resume_iteration("model_best") == 43


def test_rename_fanout_one_to_many():
    src = {"roi_heads/res5/0/conv1/kernel": np.ones((1, 1, 4, 4)),
           "mmss_heads/v2l_projection/kernel": np.full((4, 2), 3.0)}
    dst = {"backbone/res5/0/conv1/kernel": np.zeros((1, 1, 4, 4)),
           "roi_heads/res5/0/conv1/kernel": np.zeros((1, 1, 4, 4)),
           "roi_heads/box_predictor/emb_pred/kernel": np.zeros((4, 2)),
           "untouched/x": np.zeros(3)}
    out, missing = load_with_rename_map(src, dst, STT_FROM_LSM_RENAME)
    # res5 fanned out to BOTH destinations
    assert out["backbone/res5/0/conv1/kernel"].sum() == 16
    assert out["roi_heads/res5/0/conv1/kernel"].sum() == 16
    # v2l -> emb_pred
    assert (out["roi_heads/box_predictor/emb_pred/kernel"] == 3.0).all()
    assert "untouched/x" in missing


def test_convert_d2_state_dict_layouts():
    state = {
        "backbone.stem.conv1.weight": np.zeros((64, 3, 7, 7)),
        "backbone.stem.conv1.norm.weight": np.ones(64),
        "backbone.stem.conv1.norm.running_mean": np.zeros(64),
        "backbone.res2.0.conv1.weight": np.zeros((64, 64, 1, 1)),
        "backbone.res2.0.shortcut.weight": np.zeros((256, 64, 1, 1)),
        "backbone.res2.0.shortcut.norm.running_var": np.ones(256),
        "proposal_generator.rpn_head.conv.weight":
            np.zeros((1024, 1024, 3, 3)),
        "proposal_generator.rpn_head.conv.bias": np.zeros(1024),
        "roi_heads.res5.2.conv3.weight": np.zeros((2048, 512, 1, 1)),
        "roi_heads.box_predictor.bbox_pred.weight": np.zeros((4, 2048)),
        "roi_heads.box_predictor.emb_pred.weight": np.zeros((768, 2048)),
    }
    out = convert_d2_state_dict(state)
    # conv OIHW -> HWIO
    assert out["backbone/stem/conv1/kernel"].shape == (7, 7, 3, 64)
    assert out["backbone/res2/0/shortcut/kernel"].shape == (1, 1, 64, 256)
    assert out["rpn_head/conv/kernel"].shape == (3, 3, 1024, 1024)
    # dense [out,in] -> [in,out]
    assert out["roi_heads/box_predictor/bbox_pred/kernel"].shape == \
        (2048, 4)
    assert out["roi_heads/box_predictor/emb_pred/kernel"].shape == \
        (2048, 768)
    # norm leaves preserved
    assert "backbone/stem/conv1_norm/weight" in out
    assert "backbone/stem/conv1_norm/running_mean" in out
    assert "backbone/res2/0/shortcut_norm/running_var" in out


def test_flatten_unflatten_roundtrip():
    p = _params()
    flat = flatten_params(p)
    back = unflatten_params(flat)
    np.testing.assert_allclose(np.asarray(back["params"]["a"]["w"]),
                               np.asarray(p["params"]["a"]["w"]))

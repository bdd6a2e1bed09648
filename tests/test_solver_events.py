"""Solver (SGD semantics, freezing, LR schedule) and events tests."""
import numpy as np
import jax
import jax.numpy as jnp

from locov_tpu.config import get_cfg
from locov_tpu.engine.solver import (build_optimizer, default_frozen_fn,
                                     warmup_multistep_lr)


def test_warmup_multistep_schedule():
    sched = warmup_multistep_lr(0.01, (100, 200), 0.1, 0.001, 10,
                                "linear")
    assert abs(float(sched(0)) - 0.01 * 0.001) < 1e-9
    assert abs(float(sched(5)) - 0.01 * (0.001 * 0.5 + 0.5)) < 1e-6
    assert abs(float(sched(50)) - 0.01) < 1e-9
    assert abs(float(sched(150)) - 0.001) < 1e-9
    assert abs(float(sched(250)) - 0.0001) < 1e-10


def _tiny_params():
    return {
        "backbone": {
            "stem": {"conv1": {"kernel": jnp.ones((3, 3, 3, 4))},
                     "conv1_norm": {"weight": jnp.ones(4),
                                    "bias": jnp.zeros(4),
                                    "running_mean": jnp.zeros(4),
                                    "running_var": jnp.ones(4)}},
            "res3": {"0": {"conv1": {"kernel": jnp.ones((1, 1, 4, 4))}}},
        },
        "roi_heads": {"box_predictor": {
            "emb_pred": {"kernel": jnp.ones((4, 2)),
                         "bias": jnp.zeros(2)},
            "bbox_pred": {"kernel": jnp.ones((4, 4)),
                          "bias": jnp.zeros(4)}}},
        "language_backbone": {"bert_model": {"embeddings": {
            "word_embeddings": jnp.ones((10, 2))}}},
    }


def test_sgd_matches_torch_formula():
    """One step of our SGD vs the torch update rule by hand."""
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 0.1
    cfg.SOLVER.MOMENTUM = 0.9
    cfg.SOLVER.WEIGHT_DECAY = 0.01
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.STEPS = (1000,)
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.LANGUAGE_BACKBONE.FREEZE = True
    params = {"w": jnp.full((3,), 2.0)}
    opt, sched = build_optimizer(cfg, params)
    state = opt.init(params)
    grads = {"w": jnp.full((3,), 0.5)}
    updates, state = opt.update(grads, state, params)
    # torch: d = g + wd*p = 0.5 + 0.02 = 0.52; buf = d; p -= lr*buf
    np.testing.assert_allclose(np.asarray(updates["w"]),
                               -0.1 * 0.52, rtol=1e-6)
    # second step: buf = 0.9*0.52 + 0.52
    updates2, _ = opt.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates2["w"]),
                               -0.1 * (0.9 * 0.52 + 0.52), rtol=1e-6)


def test_freezing_masks():
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.FREEZE_AT = 2  # stem frozen (res3 not)
    cfg.MODEL.LANGUAGE_BACKBONE.FREEZE = True
    cfg.MODEL.ROI_BOX_HEAD.FREEZE_EMB_PRED = True
    params = _tiny_params()
    opt, _ = build_optimizer(cfg, params,
                             frozen_fn=default_frozen_fn(cfg))
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    flat = {}
    from locov_tpu.utils.checkpoint import flatten_params
    flat = flatten_params(updates)
    # frozen: stem conv, all FrozenBN leaves, language, emb_pred
    assert np.all(flat["backbone/stem/conv1/kernel"] == 0)
    assert np.all(flat["backbone/stem/conv1_norm/running_mean"] == 0)
    assert np.all(flat[
        "language_backbone/bert_model/embeddings/word_embeddings"] == 0)
    assert np.all(flat["roi_heads/box_predictor/emb_pred/kernel"] == 0)
    # trainable: res3 conv, bbox_pred
    assert np.any(flat["backbone/res3/0/conv1/kernel"] != 0)
    assert np.any(flat["roi_heads/box_predictor/bbox_pred/kernel"] != 0)
    # frozen leaves carry scalar momentum placeholders, not full-shape
    # buffers (torch allocates no optimizer state for
    # requires_grad=False params; the frozen BERT alone would waste
    # ~440 MB of HBM otherwise)
    mom = flatten_params(state.momentum)
    assert mom["language_backbone/bert_model/embeddings/"
               "word_embeddings"].shape == ()
    assert mom["backbone/stem/conv1/kernel"].shape == ()
    assert mom["backbone/res3/0/conv1/kernel"].shape != ()


def test_grad_clip_value():
    cfg = get_cfg()
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "value"
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 5.0
    cfg.SOLVER.BASE_LR = 1.0
    cfg.SOLVER.MOMENTUM = 0.0
    cfg.SOLVER.WEIGHT_DECAY = 0.0
    cfg.SOLVER.WARMUP_ITERS = 0
    params = {"w": jnp.zeros((2,))}
    opt, _ = build_optimizer(cfg, params)
    state = opt.init(params)
    updates, _ = opt.update({"w": jnp.array([100.0, -100.0])}, state,
                            params)
    np.testing.assert_allclose(np.asarray(updates["w"]), [-5.0, 5.0])


def test_event_storage_and_writers(tmp_path):
    from locov_tpu.utils.events import (CSVWriter, EventStorage,
                                        JSONWriter, MetricPrinter)
    st = EventStorage()
    lines = []
    printer = MetricPrinter(100, logger=lines.append)
    jw = JSONWriter(str(tmp_path / "metrics.json"))
    cw = CSVWriter(str(tmp_path / "m.csv"), epoch_size=10)
    for it in range(3):
        st.iter = it
        st.put_scalar("total_loss", 1.0 / (it + 1))
        st.put_scalar("Batch Accuracy (Choose Image)", 0.5)
        st.put_scalar("time", 0.1)
        printer.write(st)
        jw.write(st)
        cw.write(st)
    assert "total_loss" in lines[-1] and "iter: 2" in lines[-1]
    import json
    rows = [json.loads(l) for l in
            open(tmp_path / "metrics.json").read().splitlines()]
    assert len(rows) == 3 and rows[1]["iteration"] == 1
    assert (tmp_path / "m.csv").exists()


def test_csv_writer_schema_stable_under_lazy_columns(tmp_path):
    """Columns that appear mid-run (eval metrics) must not break strict
    CSV consumers: the file is rewritten under one expanded header, no
    comment rows."""
    import csv

    from locov_tpu.utils.events import CSVWriter, EventStorage
    st = EventStorage()
    cw = CSVWriter(str(tmp_path / "m.csv"), epoch_size=10)
    for it in range(2):
        st.iter = it
        st.put_scalar("total_loss", float(it))
        cw.write(st)
    st.iter = 2
    st.put_scalar("total_loss", 2.0)
    st.put_scalar("bbox/AP", 0.3)  # lazily-appearing eval metric
    cw.write(st)
    st.iter = 3
    st.put_scalar("total_loss", 3.0)
    cw.write(st)

    with open(tmp_path / "m.csv", newline="") as f:
        rows = list(csv.reader(f))
    header, body = rows[0], rows[1:]
    assert "bbox/AP" in header and "total_loss" in header
    assert all(len(r) == len(header) for r in body)
    assert not any(r[0].startswith("#") for r in body)
    d = list(csv.DictReader(open(tmp_path / "m.csv", newline="")))
    assert d[0]["bbox/AP"] == ""  # padded pre-expansion row
    assert d[2]["bbox/AP"] == "0.3"


def test_gradient_accumulation_matches_full_batch():
    """k accumulation micro-steps over half-batch mean grads must equal
    ONE step on the full-batch mean grad (incl. clipping on the
    AVERAGED grad), and non-final micro-steps must not move params."""
    def make(accum):
        cfg = get_cfg()
        cfg.SOLVER.BASE_LR = 0.1
        cfg.SOLVER.MOMENTUM = 0.9
        cfg.SOLVER.WEIGHT_DECAY = 0.0
        cfg.SOLVER.WARMUP_ITERS = 0
        cfg.SOLVER.STEPS = (1000,)
        cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
        cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "value"
        cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 0.6
        cfg.SOLVER.GRADIENT_ACCUMULATION_STEPS = accum
        return build_optimizer(cfg, {"w": jnp.full((3,), 2.0)})

    params = {"w": jnp.full((3,), 2.0)}
    g1 = {"w": jnp.asarray([0.2, 1.0, -2.0])}   # half-batch means
    g2 = {"w": jnp.asarray([0.6, 1.0, 0.0])}
    gfull = jax.tree.map(lambda a, b: (a + b) / 2, g1, g2)
    # NB per-element clip at 0.6 acts DIFFERENTLY on g1/g2 than on
    # gfull — only accumulate-then-clip reproduces the full batch.

    opt_a, sched_a = make(accum=2)
    st = opt_a.init(params)
    u1, st = opt_a.update(g1, st, params)
    assert float(jnp.abs(u1["w"]).max()) == 0.0  # micro-step: no move
    u2, st = opt_a.update(g2, st, params)

    opt_f, _ = make(accum=1)
    uf, _ = opt_f.update(gfull, opt_f.init(params), params)
    np.testing.assert_allclose(np.asarray(u2["w"]), np.asarray(uf["w"]),
                               rtol=1e-6)
    # iteration-indexed schedule: micro-steps 0..1 are effective step 0
    assert float(sched_a(1)) == float(sched_a(0))


def test_restore_opt_state_multisteps_roundtrip(tmp_path):
    """MultiStepsState survives an orbax round-trip via
    restore_opt_state (NamedTuple structure rebuilt from plain dicts,
    empty skip_state taken from the template)."""
    from locov_tpu.engine.solver import restore_opt_state
    from locov_tpu.utils.checkpoint import Checkpointer
    cfg = get_cfg()
    cfg.SOLVER.GRADIENT_ACCUMULATION_STEPS = 2
    params = {"w": jnp.full((3,), 2.0)}
    opt, _ = build_optimizer(cfg, params)
    st = opt.init(params)
    _, st = opt.update({"w": jnp.ones(3)}, st, params)  # mini_step=1
    ck = Checkpointer(str(tmp_path))
    ck.save_periodic(0, {"opt_state": st})
    restored = ck.load("model_0000000")["opt_state"]
    rebuilt = restore_opt_state(restored, opt.init(params))
    assert int(rebuilt.mini_step) == 1
    np.testing.assert_allclose(np.asarray(rebuilt.acc_grads["w"]), 1.0)
    # the rebuilt state must be consumable by the next update
    u, rebuilt2 = opt.update({"w": jnp.ones(3)}, rebuilt, params)
    assert int(rebuilt2.mini_step) == 0
    assert float(jnp.abs(u["w"]).max()) > 0.0


def test_restore_opt_state_collapses_legacy_frozen_momentum():
    """Checkpoints written before the frozen-momentum diet carry
    full-shape zero buffers for frozen leaves; restoring against the
    new scalar-placeholder template must collapse them (never read,
    would silently waste the reclaimed HBM) while trainable momentum
    restores at full shape."""
    from locov_tpu.engine.solver import restore_opt_state
    cfg = get_cfg()
    cfg.MODEL.LANGUAGE_BACKBONE.FREEZE = True
    params = {"language_backbone": {"w": jnp.ones((4, 3))},
              "roi_heads": {"w": jnp.ones((2, 2))}}
    opt, _ = build_optimizer(cfg, params,
                             frozen_fn=default_frozen_fn(cfg))
    template = opt.init(params)
    assert template.momentum["language_backbone"]["w"].shape == ()
    legacy = {  # orbax-style plain dicts, pre-diet full-shape buffers
        "momentum": {"language_backbone": {"w": np.zeros((4, 3))},
                     "roi_heads": {"w": np.full((2, 2), 0.5)}},
        "step": np.asarray(7, np.int32)}
    rebuilt = restore_opt_state(legacy, template)
    assert rebuilt.momentum["language_backbone"]["w"].shape == ()
    np.testing.assert_allclose(
        np.asarray(rebuilt.momentum["roi_heads"]["w"]), 0.5)
    assert int(rebuilt.step) == 7

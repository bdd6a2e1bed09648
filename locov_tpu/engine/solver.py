"""Optimizer + LR schedule (optax), with d2 param-group semantics.

Replaces the reference's ``build_optimizer`` /
``get_default_optimizer_params`` (``ovr/engine/solver.py:9-108``) and
d2's WarmupMultiStepLR. Per-parameter hyperparameters (no weight decay
on norm layers, bias lr factor / bias weight decay, name-based
overrides) are expressed as path-keyed functions over the flax param
pytree; freezing (``requires_grad=False`` in torch: FrozenBN buffers,
BACKBONE.FREEZE_AT stages, frozen language backbone, FREEZE_EMB_PRED,
the unused transformer pooler/bi_seq when MMM_LOSS=='') becomes a mask
that zeroes those updates inside one jitted transform.
"""
from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

FROZEN_BN_LEAVES = ("running_mean", "running_var")


def warmup_multistep_lr(base_lr: float, steps, gamma: float,
                        warmup_factor: float, warmup_iters: int,
                        warmup_method: str = "linear") -> Callable:
    """d2 WarmupMultiStepLR as a pure schedule fn(step) -> lr."""
    steps = tuple(int(s) for s in steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_method == "linear" and warmup_iters > 0:
            alpha = jnp.clip(step / warmup_iters, 0.0, 1.0)
            wf = warmup_factor * (1.0 - alpha) + alpha
        elif warmup_method == "constant" and warmup_iters > 0:
            wf = jnp.where(step < warmup_iters, warmup_factor, 1.0)
        else:
            wf = 1.0
        mult = 1.0
        for s in steps:
            mult = mult * jnp.where(step >= s, gamma, 1.0)
        return base_lr * wf * mult
    return schedule


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path)


def default_frozen_fn(cfg, model_kind: str = "detector") -> Callable:
    """Returns fn(path_str) -> bool (True = parameter never trains).

    Mirrors torch requires_grad=False decisions spread across the
    reference: FrozenBN (d2 FrozenBatchNorm2d), BACKBONE.FREEZE_AT
    (d2 ResNet.freeze), LANGUAGE_BACKBONE.FREEZE
    (transf_models.py:71-76,156-164), ROI_BOX_HEAD.FREEZE_EMB_PRED
    (box_emb_head.py:141-143), and the transformer head's unused
    pooler / bi_seq_relationship when MMM_LOSS == ''
    (transformer_head.py:60-64)."""
    freeze_at = cfg.MODEL.BACKBONE.FREEZE_AT
    lang_freeze = cfg.MODEL.LANGUAGE_BACKBONE.FREEZE
    freeze_emb_pred = cfg.MODEL.ROI_BOX_HEAD.FREEZE_EMB_PRED
    mmm_loss = cfg.MODEL.MMSS_HEAD.TRANSFORMER.MMM_LOSS
    frozen_stages = []
    if freeze_at >= 1:
        frozen_stages.append("backbone/stem")
    for i, stage in enumerate(["res2", "res3", "res4", "res5"], start=2):
        if freeze_at >= i:
            frozen_stages.append(f"backbone/{stage}")

    def frozen(path: str) -> bool:
        leaf = path.rsplit("/", 1)[-1]
        if leaf in FROZEN_BN_LEAVES:
            return True
        # FrozenBN affine params: modules named *_norm / shortcut_norm
        parent = path.split("/")[-2] if "/" in path else ""
        if parent.endswith("norm") and "backbone" in path:
            return True
        if parent.endswith("norm") and "/res5/" in path:
            return True
        for st in frozen_stages:
            if path.startswith(st + "/") or f"/{st}/" in path:
                return True
        if "language_backbone" in path:
            if lang_freeze:
                return True
            # unfrozen BertEmbedding: only word_embeddings train
            if leaf != "word_embeddings":
                return True
        if freeze_emb_pred and "emb_pred" in path:
            return True
        if mmm_loss == "" and ("transformer_head/pooler" in path
                               or "bi_seq_relationship" in path):
            return True
        return False
    return frozen


class SGDState(NamedTuple):
    momentum: optax.Params
    step: jnp.ndarray


def build_optimizer(cfg, params,
                    overrides: Optional[Dict[str, Dict[str, float]]] = None,
                    frozen_fn: Optional[Callable] = None):
    """Returns (optax.GradientTransformation, schedule_fn).

    The transformation implements torch-style SGD with per-parameter
    (lr_factor, weight_decay, frozen) derived exactly as
    get_default_optimizer_params does (solver.py:35-108), plus d2's
    full-model gradient clipping when SOLVER.CLIP_GRADIENTS.ENABLED.
    """
    base_lr = cfg.SOLVER.BASE_LR
    wd = cfg.SOLVER.WEIGHT_DECAY
    wd_norm = cfg.SOLVER.WEIGHT_DECAY_NORM
    bias_lr_factor = cfg.SOLVER.BIAS_LR_FACTOR
    wd_bias = cfg.SOLVER.WEIGHT_DECAY_BIAS
    if wd_bias is None:
        wd_bias = wd
    momentum = cfg.SOLVER.MOMENTUM
    nesterov = cfg.SOLVER.NESTEROV
    frozen_fn = frozen_fn or (lambda p: False)

    schedule = warmup_multistep_lr(
        base_lr, cfg.SOLVER.STEPS, cfg.SOLVER.GAMMA,
        cfg.SOLVER.WARMUP_FACTOR, cfg.SOLVER.WARMUP_ITERS,
        cfg.SOLVER.WARMUP_METHOD)

    def param_opts(path, leaf) -> Tuple[float, float, bool]:
        p = _path_str(path)
        name = p.rsplit("/", 1)[-1]
        lr_factor, decay = 1.0, wd
        parent = p.split("/")[-2] if "/" in p else ""
        is_norm_param = (("norm" in parent.lower()
                          or parent.startswith("LayerNorm"))
                         and name in ("scale", "bias", "weight"))
        if is_norm_param:
            decay = wd_norm
        elif name == "bias":
            lr_factor = bias_lr_factor
            decay = wd_bias
        if overrides:
            for key, o in overrides.items():
                if key in p:
                    lr_factor = o.get("lr", base_lr * lr_factor) / base_lr \
                        if "lr" in o else lr_factor
                    decay = o.get("weight_decay", decay)
        return lr_factor, decay, frozen_fn(p)

    lr_factors = jax.tree_util.tree_map_with_path(
        lambda p, x: param_opts(p, x)[0], params)
    decays = jax.tree_util.tree_map_with_path(
        lambda p, x: param_opts(p, x)[1], params)
    trainable = jax.tree_util.tree_map_with_path(
        lambda p, x: not param_opts(p, x)[2], params)

    clip_cfg = cfg.SOLVER.CLIP_GRADIENTS

    def init(params):
        # Frozen leaves never read or write momentum (new_momentum
        # returns m untouched), so give them a scalar placeholder
        # instead of a full-shape zeros buffer: on LSM the frozen
        # BERT-base alone is ~440 MB of HBM that torch never allocates
        # either (requires_grad=False params have no optimizer state).
        mom = jax.tree.map(
            lambda p, tr: jnp.zeros_like(p) if tr
            else jnp.zeros((), p.dtype),
            params, trainable)
        return SGDState(momentum=mom, step=jnp.zeros((), jnp.int32))

    def update(grads, state, params):
        lr = schedule(state.step)
        # torch requires_grad=False parameters produce NO gradient, so
        # they never enter d2's gradient clipping; zero them before the
        # clip (not only in the update mask) to match.
        grads = jax.tree.map(
            lambda g, tr: g if tr else jnp.zeros_like(g), grads,
            trainable)
        if clip_cfg.ENABLED:
            if clip_cfg.CLIP_TYPE == "value":
                cv = clip_cfg.CLIP_VALUE
                grads = jax.tree.map(lambda g: jnp.clip(g, -cv, cv), grads)
            else:
                gnorm = optax.global_norm(grads)
                scalef = jnp.minimum(1.0, clip_cfg.CLIP_VALUE /
                                     jnp.maximum(gnorm, 1e-12))
                grads = jax.tree.map(lambda g: g * scalef, grads)

        def new_momentum(g, p, m, dc, tr):
            if not tr:
                return m
            return momentum * m + (g + dc * p)

        def delta(g, p, new_m, lf, dc, tr):
            if not tr:
                return jnp.zeros_like(p)
            d = g + dc * p
            step_dir = d + momentum * new_m if nesterov else new_m
            return (-lr * lf * step_dir).astype(p.dtype)

        new_mom = jax.tree.map(new_momentum, grads, params,
                               state.momentum, decays, trainable)
        updates = jax.tree.map(delta, grads, params, new_mom, lr_factors,
                               decays, trainable)
        return updates, SGDState(momentum=new_mom, step=state.step + 1)

    tx = optax.GradientTransformation(init, update)
    accum = int(getattr(cfg.SOLVER, "GRADIENT_ACCUMULATION_STEPS", 1))
    if accum > 1:
        # The reference names (but never implements) this knob in its
        # configs (configs/coco_lsm.yaml:114-115). optax.MultiSteps
        # averages grads over `accum` micro-batches and applies ONE
        # inner update — clipping and the LR schedule see the averaged
        # (large-batch-equivalent) gradient, and the schedule advances
        # per EFFECTIVE batch. Trainer iterations remain micro-batches,
        # so the iteration-indexed schedule is step//accum.
        ms = optax.MultiSteps(tx, every_k_schedule=accum)
        tx = optax.GradientTransformation(ms.init, ms.update)
        inner_schedule = schedule
        schedule = lambda step: inner_schedule(step // accum)  # noqa: E731
    return tx, schedule


def restore_opt_state(restored, template):
    """Rebuild an optimizer-state pytree (nested NamedTuples) from an
    orbax-restored plain-dict tree, using a freshly-initialized state as
    the structure template. Handles SGDState as well as wrappers like
    optax.MultiStepsState (empty-tuple fields such as ``skip_state``
    don't survive orbax round-trips and are taken from the template).

    Backward compat: checkpoints written before frozen params switched
    to scalar momentum placeholders store full-shape zero buffers for
    them; where the template leaf is a scalar and the restored one is
    not, the scalar placeholder wins (the value is never read for
    frozen leaves, and keeping the buffer would silently waste the
    ~440 MB of HBM the diet reclaimed)."""
    def rec(t, r):
        if hasattr(t, "_fields"):  # NamedTuple
            r = r if isinstance(r, dict) else \
                {f: getattr(r, f) for f in t._fields}
            return type(t)(**{f: rec(getattr(t, f), r.get(f))
                              for f in t._fields})
        if isinstance(t, dict):
            return {k: rec(v, (r or {}).get(k)) for k, v in t.items()}
        if isinstance(t, (tuple, list)):
            if len(t) == 0 or r is None:
                return t
            return type(t)(rec(tv, rv) for tv, rv in zip(t, r))
        if r is None:
            return t
        r = jnp.asarray(r)
        if getattr(t, "shape", None) == () and \
                getattr(r, "shape", ()) != ():
            return t  # frozen-leaf placeholder beats the old buffer
        return r
    return rec(template, restored)

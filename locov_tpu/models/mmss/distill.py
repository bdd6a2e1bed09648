"""Mutual-distillation losses between the grounding and transformer
heads' pairwise cost matrices.

Ports of ``MultiDistillLoss`` (KD), ``MultiDistillLossJS`` and
``MultiDistillLossL2`` (``ovr/modeling/meta_arch/distill_mmss_gcnn.py:
211-433``), including the transformer-teacher / grounding-teacher
direction switch and the detach-teacher option. Note the reference's
JS variant compares img-direction students against m_cap_* means
(distill_mmss_gcnn.py:363-371); that asymmetry is preserved.
"""
from __future__ import annotations

from typing import Callable

import jax

from ...ops.losses import kl_div_batchmean


def _softmaxes(pw_cost, temp):
    p_cap = jax.nn.softmax(-pw_cost / temp, axis=0)
    p_img = jax.nn.softmax(-pw_cost / temp, axis=1).T
    l_cap = jax.nn.log_softmax(-pw_cost / temp, axis=0)
    l_img = jax.nn.log_softmax(-pw_cost / temp, axis=1).T
    return p_cap, p_img, l_cap, l_img


def kd_loss(trans_pw, w2r_pw, r2w_pw, temp, loss_weight=1.0,
            detach_teacher=False, transformer_teacher=True):
    t2 = temp * temp
    if transformer_teacher:
        if detach_teacher:
            trans_pw = jax.lax.stop_gradient(trans_pw)
        p_cap, p_img, _, _ = _softmaxes(trans_pw, temp)
        _, _, lw_cap, lw_img = _softmaxes(w2r_pw, temp)
        _, _, lr_cap, lr_img = _softmaxes(r2w_pw, temp)
        loss = (kl_div_batchmean(lw_cap, p_cap)
                + kl_div_batchmean(lr_cap, p_cap)
                + kl_div_batchmean(lw_img, p_img)
                + kl_div_batchmean(lr_img, p_img)) * t2
    else:
        if detach_teacher:
            w2r_pw = jax.lax.stop_gradient(w2r_pw)
            r2w_pw = jax.lax.stop_gradient(r2w_pw)
        _, _, l_cap, l_img = _softmaxes(trans_pw, temp)
        pw_cap, pw_img, _, _ = _softmaxes(w2r_pw, temp)
        pr_cap, pr_img, _, _ = _softmaxes(r2w_pw, temp)
        loss = (kl_div_batchmean(l_cap, pw_cap)
                + kl_div_batchmean(l_cap, pr_cap)
                + kl_div_batchmean(l_img, pw_img)
                + kl_div_batchmean(l_img, pr_img)) * t2
    return loss * loss_weight


def js_loss(trans_pw, w2r_pw, r2w_pw, temp, loss_weight=1.0,
            detach_teacher=False, transformer_teacher=True):
    if transformer_teacher and detach_teacher:
        trans_pw = jax.lax.stop_gradient(trans_pw)
    elif detach_teacher:
        w2r_pw = jax.lax.stop_gradient(w2r_pw)
        r2w_pw = jax.lax.stop_gradient(r2w_pw)
    t2 = temp * temp
    p_cap, p_img, l_cap, l_img = _softmaxes(trans_pw, temp)
    pw_cap, pw_img, lw_cap, lw_img = _softmaxes(w2r_pw, temp)
    pr_cap, pr_img, lr_cap, lr_img = _softmaxes(r2w_pw, temp)

    m_cap_w2r = 0.5 * (p_cap + pw_cap)
    m_cap_r2w = 0.5 * (p_cap + pr_cap)

    js = (0.5 * kl_div_batchmean(l_cap, m_cap_w2r) * t2
          + 0.5 * kl_div_batchmean(lw_cap, m_cap_w2r) * t2
          + 0.5 * kl_div_batchmean(l_cap, m_cap_r2w) * t2
          + 0.5 * kl_div_batchmean(lr_cap, m_cap_r2w) * t2
          # reference compares img-direction terms against the cap means
          # (distill_mmss_gcnn.py:363-371)
          + 0.5 * kl_div_batchmean(l_img, m_cap_w2r) * t2
          + 0.5 * kl_div_batchmean(lw_img, m_cap_w2r) * t2
          + 0.5 * kl_div_batchmean(l_img, m_cap_r2w) * t2
          + 0.5 * kl_div_batchmean(lr_img, m_cap_r2w) * t2)
    return js * loss_weight


def mse_loss(trans_pw, w2r_pw, r2w_pw, temp, loss_weight=1.0,
             detach_teacher=False, transformer_teacher=True):
    if transformer_teacher and detach_teacher:
        trans_pw = jax.lax.stop_gradient(trans_pw)
    elif detach_teacher:
        w2r_pw = jax.lax.stop_gradient(w2r_pw)
        r2w_pw = jax.lax.stop_gradient(r2w_pw)
    mse = lambda a, b: ((a - b) ** 2).mean()
    loss = (mse(trans_pw, w2r_pw) + mse(trans_pw, r2w_pw)
            + mse(trans_pw.T, w2r_pw.T) + mse(trans_pw.T, r2w_pw.T))
    return loss * loss_weight


DISTILL_LOSSES: dict = {"KD": kd_loss, "JS": js_loss, "MSE": mse_loss}


def build_distill_loss(cfg) -> Callable:
    m = cfg.MODEL.MMSS_HEAD
    fn = DISTILL_LOSSES[m.DISTILLATION_LOSS_TYPE]
    temp = m.DISTILLATION_TEMPERATURE
    weight = m.DISTILLATION_LOSS_WEIGHT
    detach = m.DISTILLATION_DETACH_TEACHER
    trans_teacher = m.DISTILLATION_TEACHER_TRANSFORMER

    def loss(trans_pw, w2r_pw, r2w_pw):
        return fn(trans_pw, w2r_pw, r2w_pw, temp, weight, detach,
                  trans_teacher)
    return loss

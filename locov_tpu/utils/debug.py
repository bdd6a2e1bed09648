"""NaN forensics — the LoggedModule analogue.

The reference's ``LoggedModule`` (``ovr/modeling/logged_module.py``)
keeps min/max/mean/std of named tensors so a NaN loss can print the
culprit (``distill_prop_mmss_gcnn.py:444-449``). Under jit we instead
provide: (1) ``tensor_stats`` — a jit-safe stats dict a model can fold
into its metrics, (2) ``enable_nan_debugging`` — switches on JAX's
global nan-checker (jax_debug_nans) which re-runs the failing op
un-jitted and points at it, and (3) ``nan_guard`` — jax.debug.print of
stats when a named tensor goes non-finite (TPU.DEBUG_NANS flag)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def tensor_stats(name: str, x: jnp.ndarray) -> dict:
    """min/max/mean/std of a tensor (LoggedModule.log semantics)."""
    xf = x.astype(jnp.float32)
    return {
        f"{name}/min": xf.min(), f"{name}/max": xf.max(),
        f"{name}/mean": xf.mean(), f"{name}/std": xf.std(),
    }


def nan_guard(name: str, x: jnp.ndarray, enabled: bool = True):
    """Print stats from inside jit when a tensor goes non-finite."""
    if not enabled:
        return x
    finite = jnp.isfinite(x.astype(jnp.float32)).all()

    def report(t):
        jax.debug.print(
            "NaN-guard [" + name + "]: finite={f} min={mn} max={mx} "
            "mean={me}", f=finite, mn=t.min(), mx=t.max(), me=t.mean())
        return t

    return jax.lax.cond(finite, lambda t: t,
                        lambda t: report(t), x)


def enable_nan_debugging():
    """Global fail-fast NaN mode (wired from TPU.DEBUG_NANS)."""
    jax.config.update("jax_debug_nans", True)

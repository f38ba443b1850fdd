"""Checkpoint / resume between warmup stages.

The reference has no checkpointing (``mcmc_with_warmup`` runs to completion in
one call, ``mcmc.jl:94-106``), but its explicit ``WarmupState`` is a complete
resume point between stages (SURVEY.md §5).  Here that observation becomes a
feature: ``(rng_key, WarmupState, stage index)`` is serialized after every
warmup stage, so a preempted multi-hour run restarts at the last finished
stage — the standard TPU-pod failure-handling model (orchestrator restart +
checkpoint, no in-job elasticity).
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.metric import DenseMetric, DiagMetric
from ..core.state import EvalPoint, WarmupState


def save_warmup_checkpoint(path: str, state: WarmupState, key, stage_idx: int):
    """Atomically write the warmup state to ``path`` (.npz)."""
    metric = state.metric
    payload = {
        "q": np.asarray(state.z.q),
        "logp": np.asarray(state.z.logp),
        "grad": np.asarray(state.z.grad),
        "key": np.asarray(key),
        "stage_idx": np.asarray(stage_idx),
        "metric_kind": np.asarray("diag" if isinstance(metric, DiagMetric) else "dense"),
        "metric_inv": np.asarray(metric.inv),
        "metric_aux": np.asarray(metric.sqrt_mass if isinstance(metric, DiagMetric)
                                 else metric.mass_chol),
        "has_eps": np.asarray(state.log_eps is not None),
    }
    if state.log_eps is not None:
        payload["log_eps"] = np.asarray(state.log_eps)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_warmup_checkpoint(path: str) -> Tuple[WarmupState, jnp.ndarray, int]:
    """Load ``(state, key, stage_idx)`` written by :func:`save_warmup_checkpoint`."""
    with np.load(path, allow_pickle=False) as z:
        ev = EvalPoint(q=jnp.asarray(z["q"]), logp=jnp.asarray(z["logp"]),
                       grad=jnp.asarray(z["grad"]))
        if str(z["metric_kind"]) == "diag":
            metric = DiagMetric(inv=jnp.asarray(z["metric_inv"]),
                                sqrt_mass=jnp.asarray(z["metric_aux"]))
        else:
            metric = DenseMetric(inv=jnp.asarray(z["metric_inv"]),
                                 mass_chol=jnp.asarray(z["metric_aux"]))
        log_eps = jnp.asarray(z["log_eps"]) if bool(z["has_eps"]) else None
        key = jnp.asarray(z["key"])
        stage_idx = int(z["stage_idx"])
    return WarmupState(z=ev, metric=metric, log_eps=log_eps), key, stage_idx


def warmup_with_checkpoints(kernel, key, state: WarmupState, stages,
                            path: str, reporter=None):
    """Run ``kernel``'s warmup stage-by-stage, checkpointing after each stage
    and resuming from ``path`` if it exists.  Returns ``(state, warmup_stats)``
    (stats only from stages run in this process)."""
    start = 0
    if os.path.exists(path):
        state, key, start = load_warmup_checkpoint(path)
    warmup_stats = []
    stages = list(stages)
    for idx in range(start, len(stages)):
        key, sub = jax.random.split(key)
        state, stats = kernel.warmup(sub, state, [stages[idx]], reporter)
        warmup_stats.extend(stats)
        save_warmup_checkpoint(path, state, key, idx + 1)
    return state, warmup_stats

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

from ..core.metric import DenseMetric, DiagMetric, LowRankMetric
from ..core.state import EvalPoint, WarmupState


def save_warmup_checkpoint(path: str, state: WarmupState, key, stage_idx: int):
    """Atomically write the warmup state to ``path`` (.npz)."""
    metric = state.metric
    if isinstance(metric, DiagMetric):
        kind, inv, aux = "diag", metric.inv, metric.sqrt_mass
    elif isinstance(metric, DenseMetric):
        kind, inv, aux = "dense", metric.inv, metric.mass_chol
    else:
        kind, inv, aux = "low_rank", metric.diag_inv, metric.u
    payload = {
        "q": np.asarray(state.z.q),
        "logp": np.asarray(state.z.logp),
        "grad": np.asarray(state.z.grad),
        "key": np.asarray(key),
        "stage_idx": np.asarray(stage_idx),
        "metric_kind": np.asarray(kind),
        "metric_inv": np.asarray(inv),
        "metric_aux": np.asarray(aux),
        "has_eps": np.asarray(state.log_eps is not None),
    }
    if isinstance(metric, LowRankMetric):
        payload["metric_w"] = np.asarray(metric.w)
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
        kind = str(z["metric_kind"])
        if kind == "diag":
            metric = DiagMetric(inv=jnp.asarray(z["metric_inv"]),
                                sqrt_mass=jnp.asarray(z["metric_aux"]))
        elif kind == "low_rank":
            metric = LowRankMetric(diag_inv=jnp.asarray(z["metric_inv"]),
                                   u=jnp.asarray(z["metric_aux"]),
                                   w=jnp.asarray(z["metric_w"]))
        else:
            metric = DenseMetric(inv=jnp.asarray(z["metric_inv"]),
                                 mass_chol=jnp.asarray(z["metric_aux"]))
        log_eps = jnp.asarray(z["log_eps"]) if bool(z["has_eps"]) else None
        key = jnp.asarray(z["key"])
        stage_idx = int(z["stage_idx"])
    return WarmupState(z=ev, metric=metric, log_eps=log_eps), key, stage_idx


def save_sampling_checkpoint(path: str, z: EvalPoint, key, done: int, blocks):
    """Atomically checkpoint mid-sampling progress: current phase point, RNG
    key, number of draws completed, and all draws/stats collected so far
    (the ``draw_block`` loop is the natural checkpoint boundary for long
    sampling runs — the reference runs to completion in one call,
    ``mcmc.jl:94-106``, and cannot resume)."""
    merged = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0) if xs[0].ndim else xs[0],
        *blocks)
    payload = {
        "q": np.asarray(z.q), "logp": np.asarray(z.logp),
        "grad": np.asarray(z.grad), "key": np.asarray(key),
        "done": np.asarray(done),
        "draws": np.asarray(merged.draws),
    }
    for name in merged.stats._fields:
        payload["stat_" + name] = np.asarray(getattr(merged.stats, name))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_sampling_checkpoint(path: str):
    """Load a :func:`save_sampling_checkpoint` file; returns ``(z, key, done,
    [block])`` with the collected draws repackaged as one block, or ``None``
    if the file does not exist."""
    from ..adapt.warmup import SamplingResult
    from ..core.state import TreeStats

    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as f:
        z = EvalPoint(q=jnp.asarray(f["q"]), logp=jnp.asarray(f["logp"]),
                      grad=jnp.asarray(f["grad"]))
        stats = TreeStats(**{name: jnp.asarray(f["stat_" + name])
                             for name in TreeStats._fields})
        block = SamplingResult(z=z, draws=jnp.asarray(f["draws"]), stats=stats)
        return z, jnp.asarray(f["key"]), int(f["done"]), [block]


def _acov_payload(prefix, a, payload):
    payload[prefix + "qref"] = np.asarray(a.qref)
    payload[prefix + "ring"] = np.asarray(a.ring)
    payload[prefix + "s1"] = np.asarray(a.s1)
    payload[prefix + "lag"] = np.asarray(a.lag)
    payload[prefix + "cnt_lag"] = np.asarray(a.cnt_lag)
    payload[prefix + "cnt"] = np.asarray(a.cnt)


def _acov_load(prefix, f):
    from ..sketch import AutocovSketch
    return AutocovSketch(qref=jnp.asarray(f[prefix + "qref"]),
                         ring=jnp.asarray(f[prefix + "ring"]),
                         s1=jnp.asarray(f[prefix + "s1"]),
                         lag=jnp.asarray(f[prefix + "lag"]),
                         cnt_lag=jnp.asarray(f[prefix + "cnt_lag"]),
                         cnt=jnp.asarray(f[prefix + "cnt"]))


def save_lean_checkpoint(path: str, z: EvalPoint, key, done: int, blocks,
                         mom=None, sketch=None):
    """Checkpoint a streaming-accumulator (``collect_moments`` /
    ``collect_sketch``) sampling run: phase point, RNG key, progress, stats
    blocks (draws may be zero-width in ``store_draws=False`` mode), and the
    accumulator pytrees — the long-run / lean-memory analog of
    :func:`save_sampling_checkpoint`."""
    merged = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0) if xs[0].ndim else xs[0],
        *blocks)
    payload = {
        "q": np.asarray(z.q), "logp": np.asarray(z.logp),
        "grad": np.asarray(z.grad), "key": np.asarray(key),
        "done": np.asarray(done), "draws": np.asarray(merged.draws),
        "has_mom": np.asarray(mom is not None),
        "has_sketch": np.asarray(sketch is not None),
    }
    for name in merged.stats._fields:
        payload["stat_" + name] = np.asarray(getattr(merged.stats, name))
    if mom is not None:
        payload.update(mom_qref=np.asarray(mom.qref), mom_cnt=np.asarray(mom.cnt),
                       mom_s1=np.asarray(mom.s1), mom_s2=np.asarray(mom.s2))
    if sketch is not None:
        rk = sketch.rank
        payload.update(rk_lo=np.asarray(rk.lo), rk_width=np.asarray(rk.width),
                       rk_counts=np.asarray(rk.counts), rk_cnt=np.asarray(rk.cnt))
        _acov_payload("ac_", sketch.acov, payload)
        payload["has_tail"] = np.asarray(sketch.tail is not None)
        if sketch.tail is not None:
            t = sketch.tail
            payload.update(tail_q05=np.asarray(t.q05), tail_q95=np.asarray(t.q95),
                           tail_start=np.asarray(t.start))
            _acov_payload("tlo_", t.lo, payload)
            _acov_payload("thi_", t.hi, payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_lean_checkpoint(path: str):
    """Load a :func:`save_lean_checkpoint` file; returns ``(z, key, done,
    [block], mom, sketch)`` or ``None`` if the file does not exist."""
    from ..adapt.warmup import SamplingResult, SplitMoments
    from ..core.state import TreeStats
    from ..sketch import RankHistSketch, StreamSketch, TailSketch

    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as f:
        z = EvalPoint(q=jnp.asarray(f["q"]), logp=jnp.asarray(f["logp"]),
                      grad=jnp.asarray(f["grad"]))
        stats = TreeStats(**{name: jnp.asarray(f["stat_" + name])
                             for name in TreeStats._fields})
        block = SamplingResult(z=z, draws=jnp.asarray(f["draws"]), stats=stats)
        mom = None
        if bool(f["has_mom"]):
            mom = SplitMoments(qref=jnp.asarray(f["mom_qref"]),
                               cnt=jnp.asarray(f["mom_cnt"]),
                               s1=jnp.asarray(f["mom_s1"]),
                               s2=jnp.asarray(f["mom_s2"]))
        sketch = None
        if bool(f["has_sketch"]):
            rank = RankHistSketch(lo=jnp.asarray(f["rk_lo"]),
                                  width=jnp.asarray(f["rk_width"]),
                                  counts=jnp.asarray(f["rk_counts"]),
                                  cnt=jnp.asarray(f["rk_cnt"]))
            tail = None
            if bool(f["has_tail"]):
                tail = TailSketch(q05=jnp.asarray(f["tail_q05"]),
                                  q95=jnp.asarray(f["tail_q95"]),
                                  lo=_acov_load("tlo_", f),
                                  hi=_acov_load("thi_", f),
                                  start=jnp.asarray(f["tail_start"]))
            sketch = StreamSketch(rank=rank, acov=_acov_load("ac_", f),
                                  tail=tail)
        return z, jnp.asarray(f["key"]), int(f["done"]), [block], mom, sketch


def warmup_with_checkpoints(kernel, key, state: WarmupState, stages,
                            path: str, reporter=None, tuning_chunk=None):
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
        state, stats = kernel.warmup(sub, state, [stages[idx]], reporter,
                                     tuning_chunk=tuning_chunk)
        warmup_stats.extend(stats)
        save_warmup_checkpoint(path, state, key, idx + 1)
    return state, warmup_stats

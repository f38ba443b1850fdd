"""Warmup stages and the windowed adaptation schedule.

TPU rebuild of ``/root/reference/src/warmup.jl``: the stage protocol
(``warmup!`` per stage type, ``warmup.jl:69-314``) becomes one pure function
per stage, each individually jittable; the ``@generated`` stage unroller
(``warmup.jl:397-408``) becomes a plain Python loop in the driver
(``sample.py``) — stage lengths are static, so each stage compiles once.

New TPU capability beyond the reference: *pooled* cross-chain adaptation —
one shared step size adapted on the mean acceptance across every chain (and
every device, via ``lax.pmean`` under ``shard_map`` or automatically under
GSPMD sharding), and a pooled mass matrix estimated from all chains' draws.
The reference's chains adapt fully independently (``mcmc.jl:150-156``); both
modes are supported here, pooled is the TPU-idiomatic default.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import (DualAveraging, FindLocalOptimum,
                      InitialStepsizeSearch, NUTS, TuningNUTS)
from ..core.hamiltonian import evaluate
from ..core.metric import (Metric, estimate_dense_metric, estimate_diag_metric,
                           estimate_low_rank_metric, identity_metric,
                           sample_momentum)
from ..core.state import EvalPoint, PhasePoint, TreeStats, WarmupState
from ..nuts.tree import nuts_transition
from .optimize import lbfgs_batched
from .step_size import (da_current_eps, da_final_eps, da_init, da_update,
                        find_initial_stepsize)


def random_position(key, n_chains: int, dim: int, dtype) -> jnp.ndarray:
    """Uniform starting positions in ``[-2, 2]^D`` (``warmup.jl:73-82``)."""
    return jax.random.uniform(key, (n_chains, dim), dtype, -2.0, 2.0)


def init_warmup_state(key, potential: Callable, dim: int, n_chains: int,
                      dtype=jnp.float32, q: Optional[jnp.ndarray] = None,
                      metric: Optional[Metric] = None,
                      eps: Optional[float] = None) -> WarmupState:
    """Initial warmup state (``initialize_warmup_state``, ``warmup.jl:100-129``):
    random position (unless given), identity metric (unless given), eps
    ``None`` to request the heuristic search."""
    if q is None:
        q = random_position(key, n_chains, dim, dtype)
    else:
        q = jnp.asarray(q, dtype)
        if q.ndim == 1:
            q = jnp.broadcast_to(q[None], (n_chains, dim))
    if metric is None:
        metric = identity_metric(dim, dtype)
    log_eps = None if eps is None else jnp.log(jnp.asarray(eps, dtype))
    return WarmupState(z=evaluate(potential, q), metric=metric, log_eps=log_eps)


# ---------------------------------------------------------------------------
# stage: FindLocalOptimum
# ---------------------------------------------------------------------------

_OPTIMIZE_CACHE: dict = {}


def run_local_optimum(key, logp_scalar: Callable, potential: Callable,
                      stage: FindLocalOptimum, state: WarmupState) -> WarmupState:
    """Penalized L-BFGS toward the typical set (``warmup.jl:152-186``).

    Objective per chain: ``-(logp(q) - 0.5 * pen * ||q||^2)``.  Chains whose
    optimized log density is non-finite are restarted from fresh random
    positions with a doubled penalty (``warmup.jl:162-171``), vectorized:
    every retry re-optimizes only via masking, up to ``max_retries``.

    The penalty is a *runtime* argument of one cached jitted optimizer, so
    retries (and repeated runs on the same model) never recompile the L-BFGS
    while_loop.
    """
    dim = state.z.q.shape[-1]
    dtype = state.z.q.dtype

    cache_key = (logp_scalar, stage.iterations)
    if cache_key not in _OPTIMIZE_CACHE:
        def obj(q, pen):
            val = logp_scalar(q)
            return -(val - 0.5 * pen * jnp.sum(q * q))

        vag = jax.value_and_grad(obj)

        @jax.jit
        def opt(q0, pen):
            return lbfgs_batched(lambda qq: vag(qq, pen), q0, stage.iterations)

        _OPTIMIZE_CACHE[cache_key] = opt
    opt = _OPTIMIZE_CACHE[cache_key]

    q = state.z.q
    pen = stage.magnitude_penalty
    for attempt in range(stage.max_retries + 1):
        q_opt, f_opt, _ = opt(q, jnp.asarray(pen, dtype))
        z = evaluate(potential, q_opt)
        bad = ~jnp.isfinite(z.logp)
        if not bool(jnp.any(bad)):
            return WarmupState(z=z, metric=state.metric, log_eps=state.log_eps)
        key, sub = jax.random.split(key)
        fresh = random_position(sub, q.shape[0], dim, dtype)
        q = jnp.where(bad[:, None], fresh, q_opt)
        pen = pen * 2.0
    # reference throws after exhausting retries (warmup.jl:172); we keep the
    # best finite positions and let divergence handling cope.
    return WarmupState(z=evaluate(potential, q), metric=state.metric,
                       log_eps=state.log_eps)


# ---------------------------------------------------------------------------
# stage: InitialStepsizeSearch
# ---------------------------------------------------------------------------

def run_stepsize_search(key, potential: Callable, stage: InitialStepsizeSearch,
                        state: WarmupState, pooled: bool = False,
                        axis_name: Optional[str] = None) -> WarmupState:
    """Momentum refresh + bracket/bisect search (``warmup.jl:188-201``).

    ``pooled`` collapses the per-chain step sizes to one shared value via the
    geometric mean (cross-device with ``pmean`` when ``axis_name`` is set).
    """
    dtype = state.z.q.dtype
    p = sample_momentum(state.metric, key, state.z.q.shape, dtype)
    z = PhasePoint(Q=state.z, p=p)
    eps = find_initial_stepsize(stage, potential, state.metric, z)
    log_eps = jnp.log(eps)
    if pooled:
        log_eps = jnp.mean(log_eps)
        if axis_name is not None:
            log_eps = lax.pmean(log_eps, axis_name)
    return WarmupState(z=state.z, metric=state.metric, log_eps=log_eps)


# ---------------------------------------------------------------------------
# stage: TuningNUTS (the N-transition window)
# ---------------------------------------------------------------------------

class TuningResult(NamedTuple):
    state: WarmupState
    draws: jnp.ndarray     # [N, C, D]
    stats: TreeStats       # [N, C] fields
    eps_log: jnp.ndarray   # [N] or [N, C] step sizes used


def run_tuning(key, potential: Callable, stage: TuningNUTS, algorithm: NUTS,
               state: WarmupState, pooled: bool = False,
               axis_name: Optional[str] = None,
               step_factory: Optional[Callable] = None,
               transition_factory: Optional[Callable] = None) -> TuningResult:
    """One tuning window (``warmup.jl:269-314``): N NUTS transitions with
    per-step dual averaging, then an optional metric re-estimate from the
    window's draws."""
    dtype = state.z.q.dtype
    n = stage.n
    adapting = isinstance(stage.stepsize_adaptation, DualAveraging)
    assert state.log_eps is not None, "TuningNUTS requires an initial eps"

    eps0 = jnp.exp(state.log_eps)
    da = da_init(stage.stepsize_adaptation, eps0) if adapting else None
    keys = jax.random.split(key, n)
    fused_step = step_factory(state.metric) if step_factory is not None else None
    fused_trans = (transition_factory(state.metric, state.z.q.shape[0])
                   if transition_factory is not None else None)

    def step(carry, k):
        z, da = carry
        eps = da_current_eps(da) if adapting else eps0
        if fused_trans is not None:
            z2, stats = fused_trans(k, z, eps)
        else:
            z2, stats = nuts_transition(k, potential, state.metric, z, eps,
                                        max_depth=algorithm.max_depth,
                                        min_delta=algorithm.min_delta,
                                        step_fn=fused_step)
        if adapting:
            a = stats.acceptance_rate
            if pooled:
                a = jnp.mean(a)
                if axis_name is not None:
                    a = lax.pmean(a, axis_name)
            da = da_update(stage.stepsize_adaptation, da, a)
        return (z2, da), (z2.q, stats, eps)

    (z, da), (qs, stats, eps_log) = lax.scan(step, (state.z, da), keys)

    metric = state.metric
    if stage.metric == "diag":
        metric = estimate_diag_metric(qs, stage.lam_value, pooled=pooled,
                                      axis_name=axis_name)
    elif stage.metric == "dense":
        metric = estimate_dense_metric(qs, stage.lam_value, pooled=pooled,
                                       axis_name=axis_name)
    elif stage.metric == "low_rank":
        metric = estimate_low_rank_metric(qs, stage.lam_value, stage.rank,
                                          axis_name=axis_name)

    log_eps = jnp.log(da_final_eps(da)) if adapting else state.log_eps
    new_state = WarmupState(z=z, metric=metric, log_eps=log_eps)
    return TuningResult(state=new_state, draws=qs, stats=stats, eps_log=eps_log)


class TuningChunkResult(NamedTuple):
    z: EvalPoint
    da: tuple               # dual-averaging carry (None when not adapting)
    draws: jnp.ndarray      # [n, C, D]
    stats: TreeStats
    eps_log: jnp.ndarray


def run_tuning_chunk(key, potential: Callable, stage: TuningNUTS,
                     algorithm: NUTS, state: WarmupState, da, n: int,
                     pooled: bool = False, axis_name: Optional[str] = None,
                     step_factory: Optional[Callable] = None,
                     transition_factory: Optional[Callable] = None
                     ) -> TuningChunkResult:
    """``n`` transitions of a tuning window with the dual-averaging carry
    passed in/out — the unit of in-window progress reporting (the reference
    reports every ~100 transitions inside a window, ``reporting.jl:90-109``;
    one chunk = one device call = one reporter tick).  Metric estimation
    happens once per *window* in :func:`finalize_tuning`."""
    adapting = isinstance(stage.stepsize_adaptation, DualAveraging)
    eps0 = jnp.exp(state.log_eps)
    keys = jax.random.split(key, n)
    fused_step = step_factory(state.metric) if step_factory is not None else None
    fused_trans = (transition_factory(state.metric, state.z.q.shape[0])
                   if transition_factory is not None else None)

    def step(carry, k):
        z, da = carry
        eps = da_current_eps(da) if adapting else eps0
        if fused_trans is not None:
            z2, stats = fused_trans(k, z, eps)
        else:
            z2, stats = nuts_transition(k, potential, state.metric, z, eps,
                                        max_depth=algorithm.max_depth,
                                        min_delta=algorithm.min_delta,
                                        step_fn=fused_step)
        if adapting:
            a = stats.acceptance_rate
            if pooled:
                a = jnp.mean(a)
                if axis_name is not None:
                    a = lax.pmean(a, axis_name)
            da = da_update(stage.stepsize_adaptation, da, a)
        return (z2, da), (z2.q, stats, eps)

    (z, da), (qs, stats, eps_log) = lax.scan(step, (state.z, da), keys)
    return TuningChunkResult(z=z, da=da, draws=qs, stats=stats,
                             eps_log=eps_log)


def finalize_tuning(stage: TuningNUTS, state: WarmupState, z: EvalPoint, da,
                    qs: jnp.ndarray, pooled: bool = False,
                    axis_name: Optional[str] = None) -> WarmupState:
    """Close a tuning window: final eps from the dual-averaging carry and the
    optional metric re-estimate over the window's draws (``warmup.jl:309``)."""
    adapting = isinstance(stage.stepsize_adaptation, DualAveraging)
    metric = state.metric
    if stage.metric == "diag":
        metric = estimate_diag_metric(qs, stage.lam_value, pooled=pooled,
                                      axis_name=axis_name)
    elif stage.metric == "dense":
        metric = estimate_dense_metric(qs, stage.lam_value, pooled=pooled,
                                       axis_name=axis_name)
    elif stage.metric == "low_rank":
        metric = estimate_low_rank_metric(qs, stage.lam_value, stage.rank,
                                          axis_name=axis_name)
    log_eps = jnp.log(da_final_eps(da)) if adapting else state.log_eps
    return WarmupState(z=z, metric=metric, log_eps=log_eps)


# ---------------------------------------------------------------------------
# post-warmup sampling loop
# ---------------------------------------------------------------------------

class SamplingResult(NamedTuple):
    z: EvalPoint
    draws: jnp.ndarray   # [N, C, D]
    stats: TreeStats     # [N, C]


def run_sampling(key, potential: Callable, algorithm: NUTS, state: WarmupState,
                 n_draws: int,
                 step_factory: Optional[Callable] = None,
                 transition_factory: Optional[Callable] = None,
                 thin: int = 1) -> SamplingResult:
    """The post-warmup loop ``mcmc!`` (``warmup.jl:316-332``): fixed eps and
    metric, collect positions and tree statistics.

    ``thin > 1`` runs ``thin`` transitions per recorded draw (keeping the
    last), bounding chain-storage memory for huge chain counts; the recorded
    statistics are those of the recorded transition.
    """
    eps = jnp.exp(state.log_eps)
    keys = jax.random.split(key, n_draws * thin).reshape(n_draws, thin, -1)
    fused_step = step_factory(state.metric) if step_factory is not None else None
    fused_trans = (transition_factory(state.metric, state.z.q.shape[0])
                   if transition_factory is not None else None)

    def one(z, k):
        if fused_trans is not None:
            return fused_trans(k, z, eps)
        return nuts_transition(k, potential, state.metric, z, eps,
                               max_depth=algorithm.max_depth,
                               min_delta=algorithm.min_delta,
                               step_fn=fused_step)

    def step(z, ks):
        if thin == 1:
            z2, stats = one(z, ks[0])
        else:
            def inner(carry, k):
                z2, stats = one(carry, k)
                return z2, stats
            z2, stats_all = lax.scan(inner, z, ks)
            stats = jax.tree_util.tree_map(lambda x: x[-1], stats_all)
        return z2, (z2.q, stats)

    z, (qs, stats) = lax.scan(step, state.z, keys)
    return SamplingResult(z=z, draws=qs, stats=stats)

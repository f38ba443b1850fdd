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
from ..core.metric import (Metric, dense_metric, diag_metric,
                           estimate_dense_metric, estimate_diag_metric,
                           estimate_low_rank_metric, identity_metric,
                           low_rank_metric_from_moments, moments_cov,
                           moments_variance, sample_momentum)
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
    draws: jnp.ndarray     # [N, C, D]; None when the stage streams moments
    stats: TreeStats       # [N, C] fields
    eps_log: jnp.ndarray   # [N] or [N, C] step sizes used


class StreamMoments(NamedTuple):
    """O(D)/O(D²) running moments of a tuning window, centered on the
    window-start mean position so the one-pass form stays numerically safe
    (see :func:`~inplacedhmc_tpu.core.metric.moments_variance`)."""

    qref: jnp.ndarray   # [D] center
    cnt: jnp.ndarray    # scalar sample count
    s1: jnp.ndarray     # [D] sum of centered draws
    s2: jnp.ndarray     # [D] (diag) or [D, D] (dense/low_rank Gram)


def init_stream_moments(stage: TuningNUTS, z: EvalPoint,
                        axis_name: Optional[str] = None):
    if not getattr(stage, "stream", False) or stage.metric is None:
        return None
    d = z.q.shape[-1]
    dt = z.q.dtype
    qref = jnp.mean(z.q, axis=0)
    if axis_name is not None:
        # all devices must center on the same reference or the psum'd
        # moments in _metric_from_moments mix incompatible centerings
        qref = lax.pmean(qref, axis_name)
    s2 = (jnp.zeros((d,), dt) if stage.metric == "diag"
          else jnp.zeros((d, d), dt))
    return StreamMoments(qref=qref, cnt=jnp.zeros((), dt),
                         s1=jnp.zeros((d,), dt), s2=s2)


def _update_moments(mom, stage: TuningNUTS, q):
    if mom is None:
        return None
    c = q - mom.qref
    s1 = mom.s1 + jnp.sum(c, axis=0)
    if stage.metric == "diag":
        s2 = mom.s2 + jnp.sum(c * c, axis=0)
    else:
        # preconditioner moments tolerate bf16; skip the f32 matmul default
        s2 = mom.s2 + jnp.matmul(c.T, c, precision=jax.lax.Precision.DEFAULT)
    return mom._replace(cnt=mom.cnt + q.shape[0], s1=s1, s2=s2)


def _metric_from_moments(stage: TuningNUTS, mom: StreamMoments,
                         axis_name: Optional[str], lam=None) -> Metric:
    """``lam`` optionally overrides ``stage.lam_value`` as a RUNTIME value so
    jitted finalizers can be shared across windows that differ only in n
    (lam defaults to 5/n)."""
    lam = stage.lam_value if lam is None else lam
    cnt, s1, s2 = mom.cnt, mom.s1, mom.s2
    if axis_name is not None:
        cnt = lax.psum(cnt, axis_name)
        s1 = lax.psum(s1, axis_name)
        s2 = lax.psum(s2, axis_name)
    if stage.metric == "diag":
        return diag_metric(moments_variance(cnt, s1, s2, lam))
    if stage.metric == "dense":
        return dense_metric(moments_cov(cnt, s1, s2, lam))
    return low_rank_metric_from_moments(cnt, s1, s2, lam, stage.rank)



def _one_transition(k, z, eps, *, metric, potential, algorithm,
                    fused_trans, fused_step, post_step):
    """One NUTS transition + the optional ``post_step`` hook — the single
    definition shared by tuning, chunked-tuning and sampling loops.  The hook
    key is PRE-SPLIT from the step key rather than ``fold_in(k, const)``:
    under ``shard_map`` each device's transition key is
    ``fold_in(k, axis_index)``, so a small constant would collide bitwise
    with one device's key and correlate that shard's NUTS randomness with
    the hook's."""
    if post_step is not None:
        k, k_hook = jax.random.split(k)
    if fused_trans is not None:
        z2, stats = fused_trans(k, z, eps)
    else:
        z2, stats = nuts_transition(k, potential, metric, z, eps,
                                    max_depth=algorithm.max_depth,
                                    min_delta=algorithm.min_delta,
                                    step_fn=fused_step)
    if post_step is not None:
        z2 = post_step(k_hook, z2)
    return z2, stats


#: EMA decay for work-sorted scheduling: ~4-transition memory — long enough
#: to smooth the per-transition depth noise, short enough to track a chain
#: drifting between geometric regimes (funnel neck <-> mouth)
_SCHED_DECAY = 0.75


def _sched_init(z, schedule):
    """Per-chain predicted-work EMA carry (None disables scheduling)."""
    if schedule is None:
        return None
    return jnp.zeros((z.q.shape[0],), jnp.float32)


def _scheduled_transition(k, z, ema, eps, **kw):
    """Work-sorted chain scheduling around :func:`_one_transition`.

    The whole-tree Pallas kernel executes chains in tiles with per-tile early
    exits (``ops/tree_pallas.py``), so a tile pays for its *deepest* member.
    On targets with position-persistent depth (funnel: measured utilization
    0.23; the loss concentrates deep chains randomly across all tiles), a
    stable sort by a per-chain EMA of leapfrog steps packs similar-work
    chains into the same tiles, letting shallow tiles exit early.

    Exactness: chains are exchangeable and the permutation is measurable
    w.r.t. the past, so permuting before and inverting after the transition
    composes valid Markov kernels per chain — draws, stats, moments and
    checkpoints all stay in original chain coordinates (per-chain R-hat/ESS
    time series remain coherent).  Only the RNG-to-chain pairing changes
    (momenta are iid across positions).  The reference never needs this: one
    chain per thread pays no lockstep waste (``mcmc.jl:150-156``); this is
    the TPU-side answer to its exponential-depth economics (``tree.jl:10-13``).
    """
    if ema is None:
        z2, stats = _one_transition(k, z, eps, **kw)
        return z2, stats, None
    ft = kw.get("fused_trans")
    if getattr(ft, "schedules_internally", False):
        # sharded transitions sort per-shard inside the shard_map wrapper
        # (sample._shard_map_transition): each device argsorts its local
        # chain rows — no cross-device sort collective.  The post_step hook
        # still composes here, in original chain coordinates.
        post_step = kw.get("post_step")
        if post_step is not None:
            k, k_hook = jax.random.split(k)
        z2, stats, ema2 = ft(k, z, eps, ema)
        if post_step is not None:
            z2 = post_step(k_hook, z2)
        return z2, stats, ema2
    perm = jnp.argsort(ema)                 # ascending predicted work
    inv = jnp.argsort(perm)
    take = lambda x: jnp.take(x, perm, axis=0)
    z_p = jax.tree_util.tree_map(take, z)
    eps_p = take(eps) if getattr(eps, "ndim", 0) >= 1 else eps
    z2p, stats_p = _one_transition(k, z_p, eps_p, **kw)
    untake = lambda x: jnp.take(x, inv, axis=0)
    z2 = jax.tree_util.tree_map(untake, z2p)
    stats = jax.tree_util.tree_map(untake, stats_p)
    ema2 = _SCHED_DECAY * ema \
        + (1.0 - _SCHED_DECAY) * stats.steps.astype(jnp.float32)
    return z2, stats, ema2


def run_tuning(key, potential: Callable, stage: TuningNUTS, algorithm: NUTS,
               state: WarmupState, pooled: bool = False,
               axis_name: Optional[str] = None,
               step_factory: Optional[Callable] = None,
               transition_factory: Optional[Callable] = None,
               post_step: Optional[Callable] = None,
               schedule: Optional[str] = None) -> TuningResult:
    """One tuning window (``warmup.jl:269-314``): N NUTS transitions with
    per-step dual averaging, then an optional metric re-estimate from the
    window's draws.  ``post_step(key, z) -> z`` composes an extra
    posterior-invariant kernel after every transition (e.g. an ASIS
    reparameterized hyperparameter update, ``models.stoch_vol.make_asis_hook``)."""
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

    stream = bool(stage.stream and stage.metric is not None)
    mom0 = init_stream_moments(stage, state.z, axis_name)

    def step(carry, k):
        z, da, mom, ema = carry
        eps = da_current_eps(da) if adapting else eps0
        z2, stats, ema = _scheduled_transition(
            k, z, ema, eps, metric=state.metric, potential=potential,
            algorithm=algorithm, fused_trans=fused_trans,
            fused_step=fused_step, post_step=post_step)
        if adapting:
            a = stats.acceptance_rate
            if pooled:
                a = jnp.mean(a)
                if axis_name is not None:
                    a = lax.pmean(a, axis_name)
            da = da_update(stage.stepsize_adaptation, da, a)
        mom = _update_moments(mom, stage, z2.q)
        ys = (stats, eps) if stream else (z2.q, stats, eps)
        return (z2, da, mom, ema), ys

    (z, da, mom, _), ys = lax.scan(
        step, (state.z, da, mom0, _sched_init(state.z, schedule)), keys)

    metric = state.metric
    if stream:
        qs = None
        stats, eps_log = ys
        metric = _metric_from_moments(stage, mom, axis_name)
    else:
        qs, stats, eps_log = ys
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
    draws: jnp.ndarray      # [n, C, D]; None when the stage streams moments
    stats: TreeStats
    eps_log: jnp.ndarray
    mom: Optional[StreamMoments] = None   # streamed-moment carry


def run_tuning_chunk(key, potential: Callable, stage: TuningNUTS,
                     algorithm: NUTS, state: WarmupState, da, n: int,
                     pooled: bool = False, axis_name: Optional[str] = None,
                     step_factory: Optional[Callable] = None,
                     transition_factory: Optional[Callable] = None,
                     mom: Optional[StreamMoments] = None,
                     post_step: Optional[Callable] = None,
                     schedule: Optional[str] = None
                     ) -> TuningChunkResult:
    """``n`` transitions of a tuning window with the dual-averaging carry
    passed in/out — the unit of in-window progress reporting (the reference
    reports every ~100 transitions inside a window, ``reporting.jl:90-109``;
    one chunk = one device call = one reporter tick).  Metric estimation
    happens once per *window* in :func:`finalize_tuning`.  When the stage
    streams (``stage.stream``), the running moments ``mom`` thread across
    chunks instead of the window's draws."""
    adapting = isinstance(stage.stepsize_adaptation, DualAveraging)
    stream = bool(stage.stream and stage.metric is not None)
    eps0 = jnp.exp(state.log_eps)
    keys = jax.random.split(key, n)
    fused_step = step_factory(state.metric) if step_factory is not None else None
    fused_trans = (transition_factory(state.metric, state.z.q.shape[0])
                   if transition_factory is not None else None)

    def step(carry, k):
        z, da, mom, ema = carry
        eps = da_current_eps(da) if adapting else eps0
        z2, stats, ema = _scheduled_transition(
            k, z, ema, eps, metric=state.metric, potential=potential,
            algorithm=algorithm, fused_trans=fused_trans,
            fused_step=fused_step, post_step=post_step)
        if adapting:
            a = stats.acceptance_rate
            if pooled:
                a = jnp.mean(a)
                if axis_name is not None:
                    a = lax.pmean(a, axis_name)
            da = da_update(stage.stepsize_adaptation, da, a)
        mom = _update_moments(mom, stage, z2.q)
        ys = (stats, eps) if stream else (z2.q, stats, eps)
        return (z2, da, mom, ema), ys

    # the work EMA restarts each chunk (a few transitions re-warm it); the
    # alternative — threading it through the chunk API/checkpoints — buys
    # nothing measurable at chunk lengths >= 25
    (z, da, mom, _), ys = lax.scan(
        step, (state.z, da, mom, _sched_init(state.z, schedule)), keys)
    if stream:
        stats, eps_log = ys
        qs = None
    else:
        qs, stats, eps_log = ys
    return TuningChunkResult(z=z, da=da, draws=qs, stats=stats,
                             eps_log=eps_log, mom=mom)


def finalize_tuning(stage: TuningNUTS, state: WarmupState, z: EvalPoint, da,
                    qs: Optional[jnp.ndarray], pooled: bool = False,
                    axis_name: Optional[str] = None,
                    mom: Optional[StreamMoments] = None,
                    lam=None) -> WarmupState:
    """Close a tuning window: final eps from the dual-averaging carry and the
    optional metric re-estimate over the window's draws (``warmup.jl:309``) —
    or, for a streaming stage, from the accumulated moments ``mom``.
    ``lam`` optionally overrides ``stage.lam_value`` at runtime (see
    :func:`_metric_from_moments`)."""
    adapting = isinstance(stage.stepsize_adaptation, DualAveraging)
    lam_v = stage.lam_value if lam is None else lam
    metric = state.metric
    if stage.stream and stage.metric is not None:
        metric = _metric_from_moments(stage, mom, axis_name, lam=lam_v)
    elif stage.metric == "diag":
        metric = estimate_diag_metric(qs, lam_v, pooled=pooled,
                                      axis_name=axis_name)
    elif stage.metric == "dense":
        metric = estimate_dense_metric(qs, lam_v, pooled=pooled,
                                       axis_name=axis_name)
    elif stage.metric == "low_rank":
        metric = estimate_low_rank_metric(qs, lam_v, stage.rank,
                                          axis_name=axis_name)
    log_eps = jnp.log(da_final_eps(da)) if adapting else state.log_eps
    return WarmupState(z=z, metric=metric, log_eps=log_eps)


# ---------------------------------------------------------------------------
# post-warmup sampling loop
# ---------------------------------------------------------------------------

class SplitMoments(NamedTuple):
    """Streaming split-chain moments accumulated during sampling — enough to
    compute split-R̂ over every coordinate without storing the ``[N, C, D]``
    draw array (the 10k-chain × 1k-dim operating point cannot hold it).
    Per-chain-half sums are centered on each chain's sampling-start position
    so the one-pass form stays numerically safe in f32."""

    qref: jnp.ndarray    # [C, D] per-chain center
    cnt: jnp.ndarray     # [2] draws per half
    s1: jnp.ndarray      # [2, C, D] Σ (q - qref)
    s2: jnp.ndarray      # [2, C, D] Σ (q - qref)²


def init_split_moments(q: jnp.ndarray) -> SplitMoments:
    c, d = q.shape
    dt = q.dtype
    return SplitMoments(qref=q, cnt=jnp.zeros((2,), dt),
                        s1=jnp.zeros((2, c, d), dt),
                        s2=jnp.zeros((2, c, d), dt))


class SamplingResult(NamedTuple):
    z: EvalPoint
    draws: jnp.ndarray   # [N, C, D] (or [N, C, len(keep_dims)])
    stats: TreeStats     # [N, C]
    moments: Optional[SplitMoments] = None


class SweepRunner(NamedTuple):
    """Sweep metadata a transition factory attaches (as ``_sweep``) to the
    per-transition function when the whole-tree kernel was built with
    ``padded_io`` — :func:`run_sampling` then drives the persistent padded
    loop instead of the per-transition path."""

    run_padded: Callable   # (key, q_pad, eps_col, valid_col) -> (q, lp, g, st)
    n_sweep: int           # transitions per kernel launch
    block_c: int           # kernel chain-tile size (pads C up to a multiple)


def _run_sampling_swept(key, potential, state: WarmupState, n_draws: int,
                        sweep: SweepRunner, thin: int, kd,
                        moments0: Optional[SplitMoments],
                        moment_offset, total: int) -> SamplingResult:
    """Sampling via the kernel's padded persistent loop: the scan carries the
    ``[cpad, dpad]`` state, each iteration launches one kernel running
    ``n_sweep`` sequential transitions in VMEM.  Semantics match the
    per-transition path: with ``thin``, every ``thin``-th transition's draw
    and stats are recorded; streaming split-chain moments accumulate over the
    recorded draws with the same global half assignment."""
    from ..ops.common import chain_tiles, round_up

    c, dim = state.z.q.shape
    dtype = state.z.q.dtype
    cpad, _ = chain_tiles(c, sweep.block_c)
    dpad = round_up(dim, 128)
    K = sweep.n_sweep
    Kr = K // thin                       # draws recorded per launch
    n_launch = (n_draws * thin) // K

    eps = jnp.exp(state.log_eps)
    epsc = jnp.zeros((cpad, 1), jnp.float32).at[:c, 0].set(
        jnp.broadcast_to(jnp.asarray(eps, jnp.float32), (c,)))
    validc = jnp.zeros((cpad, 1), jnp.int32).at[:c, 0].set(1)
    q_pad0 = jnp.zeros((cpad, dpad), jnp.float32).at[:c, :dim].set(state.z.q)
    keys = jax.random.split(key, n_launch)

    def step(carry, xs):
        qp, mom = carry
        k, i = xs
        q_draws, logp, grad, stats = sweep.run_padded(k, qp, epsc, validc)
        if K == 1:   # unstacked single-transition outputs: add the sweep axis
            q_draws = q_draws[None]
            stats = jax.tree_util.tree_map(lambda x: x[None], stats)
        rec_full = q_draws[thin - 1::thin, :c, :dim]      # [Kr, C, D]
        rec = rec_full if kd is None else jnp.take(rec_full, kd, axis=-1)
        stats_rec = jax.tree_util.tree_map(
            lambda x: x[thin - 1::thin, :c], stats)
        if mom is not None:
            idx = moment_offset + i * Kr + jnp.arange(Kr)
            hi = (idx >= total // 2)
            w_lo = (~hi).astype(dtype)[:, None, None]
            w_hi = hi.astype(dtype)[:, None, None]
            cd = rec_full.astype(dtype) - mom.qref[None]
            mom = mom._replace(
                cnt=mom.cnt + jnp.stack([jnp.sum(~hi), jnp.sum(hi)]
                                        ).astype(dtype),
                s1=mom.s1 + jnp.stack([jnp.sum(cd * w_lo, axis=0),
                                       jnp.sum(cd * w_hi, axis=0)]),
                s2=mom.s2 + jnp.stack([jnp.sum(cd * cd * w_lo, axis=0),
                                       jnp.sum(cd * cd * w_hi, axis=0)]))
        return (q_draws[-1], mom), (rec, stats_rec)

    (qp, mom), (qs, stats) = lax.scan(
        step, (q_pad0, moments0), (keys, jnp.arange(n_launch)))
    qs = qs.reshape((n_draws,) + qs.shape[2:])
    stats = jax.tree_util.tree_map(
        lambda x: x.reshape((n_draws,) + x.shape[2:]), stats)
    # final logp/grad are recomputed once per block (the padded loop consumes
    # only q; `potential` is the same density the kernel physics evaluates)
    z = evaluate(potential, qp[:c, :dim].astype(dtype))
    return SamplingResult(z=z, draws=qs, stats=stats, moments=mom)


def run_sampling(key, potential: Callable, algorithm: NUTS, state: WarmupState,
                 n_draws: int,
                 step_factory: Optional[Callable] = None,
                 transition_factory: Optional[Callable] = None,
                 post_step: Optional[Callable] = None,
                 thin: int = 1,
                 keep_dims: Optional[Tuple[int, ...]] = None,
                 moments0: Optional[SplitMoments] = None,
                 moment_offset: int = 0,
                 moment_total: Optional[int] = None,
                 schedule: Optional[str] = None) -> SamplingResult:
    """The post-warmup loop ``mcmc!`` (``warmup.jl:316-332``): fixed eps and
    metric, collect positions and tree statistics.

    ``thin > 1`` runs ``thin`` transitions per recorded draw (keeping the
    last), bounding chain-storage memory for huge chain counts; the recorded
    statistics are those of the recorded transition.

    ``keep_dims`` records only those coordinates in ``draws`` (memory-bounded
    mode for huge C×D; the full state still advances every dimension).
    ``moments0`` accumulates streaming split-chain moments over ALL
    dimensions (see :class:`SplitMoments`); ``moment_offset``/``moment_total``
    locate this call's draws inside the whole run so draws land in the right
    half when sampling is split into blocks."""
    eps = jnp.exp(state.log_eps)
    fused_step = step_factory(state.metric) if step_factory is not None else None
    fused_trans = (transition_factory(state.metric, state.z.q.shape[0])
                   if transition_factory is not None else None)
    total = n_draws if moment_total is None else moment_total
    kd = None if keep_dims is None else jnp.asarray(keep_dims, jnp.int32)

    # the padded/sweep fast path: the whole-tree kernel's persistent-state
    # loop (padded_io) runs K = n_sweep transitions per launch, so the
    # out-of-kernel scan body + pad/unpad amortize over the sweep (measured
    # 1.83 ms/transition of scan-body cost at the flagship point,
    # benchmarks/transition_attr.json).  Engaged when the transition factory
    # carries a sweep runner and the loop structure divides evenly; hooks and
    # scheduling force the per-transition path (they act between transitions).
    sweep = getattr(fused_trans, "_sweep", None)
    if (sweep is not None and post_step is None and schedule is None
            and sweep.n_sweep % thin == 0
            and (n_draws * thin) % sweep.n_sweep == 0):
        return _run_sampling_swept(key, potential, state, n_draws, sweep,
                                   thin=thin, kd=kd, moments0=moments0,
                                   moment_offset=moment_offset, total=total)

    keys = jax.random.split(key, n_draws * thin).reshape(n_draws, thin, -1)

    def one(z, ema, k):
        z2, stats, ema2 = _scheduled_transition(
            k, z, ema, eps, metric=state.metric, potential=potential,
            algorithm=algorithm, fused_trans=fused_trans,
            fused_step=fused_step, post_step=post_step)
        return z2, stats, ema2

    def step(carry, xs):
        z, mom, ema = carry
        ks, i = xs
        if thin == 1:
            z2, stats, ema = one(z, ema, ks[0])
        else:
            def inner(carry, k):
                z2, stats, ema2 = one(carry[0], carry[1], k)
                return (z2, ema2), stats
            (z2, ema), stats_all = lax.scan(inner, (z, ema), ks)
            stats = jax.tree_util.tree_map(lambda x: x[-1], stats_all)
        if mom is not None:
            half = ((moment_offset + i) >= total // 2).astype(jnp.int32)
            c = z2.q - mom.qref
            mom = mom._replace(
                cnt=mom.cnt.at[half].add(1),
                s1=mom.s1.at[half].add(c),
                s2=mom.s2.at[half].add(c * c))
        rec = z2.q if kd is None else jnp.take(z2.q, kd, axis=-1)
        return (z2, mom, ema), (rec, stats)

    (z, mom, _), (qs, stats) = lax.scan(
        step, (state.z, moments0, _sched_init(state.z, schedule)),
        (keys, jnp.arange(n_draws)))
    return SamplingResult(z=z, draws=qs, stats=stats, moments=mom)

"""Post-hoc and on-device MCMC diagnostics.

TPU rebuild of the reference's ``Diagnostics`` submodule
(``/root/reference/src/diagnostics.jl``): EBFMI, tree-statistics summaries,
acceptance-ratio exploration and leapfrog-trajectory visualization (the
reference's ``leapfrog_trajectory`` iterator is stale/commented-out at
``diagnostics.jl:171-181`` — implemented working here), **plus** the
north-star additions the reference lacks: split-R̂ and bulk ESS
(Vehtari et al. 2021 / Geyer initial monotone sequence), computed on device
with jnp so they run cross-chain on a sharded mesh (XLA inserts the
collectives; explicit ``axis_name`` variants live in ``parallel.collectives``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .core.hamiltonian import batched_logdensity_and_grad, evaluate, joint_logdensity
from .core.metric import Metric, identity_metric, sample_momentum
from .core.state import PhasePoint, Termination, TreeStats
from .ops.integrator import leapfrog

ACCEPTANCE_QUANTILES = (0.05, 0.25, 0.5, 0.75, 0.95)


# ---------------------------------------------------------------------------
# EBFMI and tree-statistics summary (diagnostics.jl:28-127)
# ---------------------------------------------------------------------------

def ebfmi(energies: jnp.ndarray) -> jnp.ndarray:
    """Energy Bayesian fraction of missing information (``diagnostics.jl:28-32``):
    ``mean(diff(pi)^2) / var(pi)`` per chain.  ``energies``: [N] or [N, C]."""
    e = jnp.asarray(energies)
    d = jnp.diff(e, axis=0)
    return jnp.mean(d * d, axis=0) / jnp.var(e, axis=0)


@dataclasses.dataclass
class TreeStatisticsSummary:
    """Pretty-printable summary (``diagnostics.jl:44-55, 103-127``)."""

    n: int
    acceptance_mean: float
    acceptance_quantiles: Dict[float, float]
    termination_counts: Dict[str, int]
    depth_counts: Dict[int, int]

    def __str__(self):
        qs = " ".join(f"{v:.2f}" for v in self.acceptance_quantiles.values())
        term = ", ".join(f"{k} => {round(100 * v / self.n)}%"
                         for k, v in sorted(self.termination_counts.items()))
        depth = ", ".join(f"{k} => {round(100 * v / self.n)}%"
                          for k, v in sorted(self.depth_counts.items()))
        return (f"Hamiltonian Monte Carlo sample of length {self.n}\n"
                f"  acceptance rate mean: {self.acceptance_mean:.2f}, "
                f"5/25/50/75/95%: {qs}\n"
                f"  termination: {term}\n"
                f"  depth: {depth}")


def summarize_tree_statistics(stats: TreeStats) -> TreeStatisticsSummary:
    """Acceptance quantiles + termination/depth histograms
    (``summarize_tree_statistics``, ``diagnostics.jl:94-101``)."""
    acc = np.asarray(stats.acceptance_rate).ravel()
    term = np.asarray(stats.termination).ravel()
    depth = np.asarray(stats.depth).ravel()
    term_counts = {
        "max_depth": int(np.sum(term == Termination.MAX_DEPTH)),
        "divergence": int(np.sum(term == Termination.DIVERGENCE)),
        "turning": int(np.sum(term == Termination.TURNING)),
    }
    depths, counts = np.unique(depth, return_counts=True)
    return TreeStatisticsSummary(
        n=acc.size,
        acceptance_mean=float(acc.mean()),
        acceptance_quantiles={q: float(np.quantile(acc, q))
                              for q in ACCEPTANCE_QUANTILES},
        termination_counts=term_counts,
        depth_counts={int(d): int(c) for d, c in zip(depths, counts)},
    )


def divergence_fraction(stats: TreeStats) -> float:
    return float(np.mean(np.asarray(stats.termination) == Termination.DIVERGENCE))


def _steps_depth_2d(stats: TreeStats):
    """Shared parsing for the utilization telemetry: [N, C] float steps and
    int depth (a single transition gains a leading axis of 1)."""
    steps = np.asarray(stats.steps, np.float64)
    depth = np.asarray(stats.depth)
    if steps.ndim == 1:
        steps = steps[None]
        depth = depth[None]
    return steps, depth


def _used_executed(stats: TreeStats, block_c: int, max_depth: int):
    """Per-transition (used, executed) leaf-row counts under ``block_c``
    tiling — the single tile-exit model behind both utilization telemetries.

    A tile of ``block_c`` chain rows executes ``2^(d_exit) - 1`` leaf
    iterations where ``d_exit`` is the deepest doubling any row in the tile
    completed (+1 unless capped at ``max_depth``) — the whole-tree kernel's
    doubling-block early exit (``ops/tree_pallas.py``; leaf-level exits
    inside an un-skipped block make the kernel strictly better than this
    estimate).  Each executed iteration costs ``block_c`` hardware rows, so
    padding waste from ``c % block_c != 0`` is (honestly) counted as waste;
    padded rows start inactive and never extend a tile's exit depth.
    Returns ``used [N]`` (= Σ steps) and ``executed [N]`` row counts.
    """
    steps, depth = _steps_depth_2d(stats)
    n, c = depth.shape
    block_c = min(block_c, c)   # a tile never exceeds the batch
    pad = (-c) % block_c
    if pad:
        depth = np.concatenate([depth, np.full((n, pad), -1, depth.dtype)], 1)
    tiles = depth.reshape(n, -1, block_c)                     # [N, T, BC]
    d_exit = np.minimum(tiles.max(axis=-1) + 1, max_depth)    # [N, T]
    executed = (((1 << np.maximum(d_exit, 0).astype(np.int64)) - 1)
                * block_c).sum(axis=-1)
    return steps.sum(axis=-1), np.maximum(executed, 1)


def lockstep_utilization(stats: TreeStats, max_depth: int = 10) -> float:
    """Fraction of executed lockstep leaf-iterations that did useful work
    when ALL chains run in one lockstep batch (nuts/tree.py: the loop runs
    every chain until the slowest trajectory terminates) — the telemetry for
    the straggler economics in docs/DESIGN.md §3.  Aggregation is the mean
    of per-transition ratios (each transition weighted equally);
    :func:`tiled_lockstep_utilization` with ``block_c >= n_chains`` is the
    work-weighted counterpart wall-clock follows.  Both share the tile-exit
    model in :func:`_used_executed`."""
    steps, depth = _steps_depth_2d(stats)
    used, executed = _used_executed(stats, depth.shape[1], max_depth)
    return float(np.mean(used / executed))


def tiled_lockstep_utilization(stats: TreeStats, block_c: int,
                               max_depth: int = 10) -> float:
    """Lockstep utilization when chains execute in tiles of ``block_c``
    (the whole-tree kernel's execution model) — smaller tiles straggle
    less.  Work-weighted aggregate ``sum(used) / sum(executed)`` over all
    transitions (what wall-clock follows), vs
    :func:`lockstep_utilization`'s mean of per-transition ratios; the two
    diverge whenever exit depth varies across transitions.  Because depth
    is algorithm-determined (independent of execution path), the curve over
    ``block_c`` can be measured from ONE recorded run on any backend."""
    used, executed = _used_executed(stats, block_c, max_depth)
    return float(used.sum() / executed.sum())


# ---------------------------------------------------------------------------
# split R-hat and ESS — on-device, jittable (north-star additions)
# ---------------------------------------------------------------------------

def split_rhat(draws: jnp.ndarray) -> jnp.ndarray:
    """Split-R̂ (Vehtari et al. 2021).  ``draws``: [N, C, D] → [D].

    Each chain is split in half (2C sequences of N//2), then the classic
    between/within variance ratio.  The reference has no R̂ (SURVEY.md C16);
    this is the cross-chain capability the TPU build adds.
    """
    n, c, d = draws.shape
    half = n // 2
    x = jnp.concatenate([draws[:half], draws[half:2 * half]], axis=1)  # [half, 2C, D]
    chain_mean = jnp.mean(x, axis=0)              # [2C, D]
    chain_var = jnp.var(x, axis=0, ddof=1)        # [2C, D]
    w = jnp.mean(chain_var, axis=0)               # [D]
    b = half * jnp.var(chain_mean, axis=0, ddof=1)
    var_plus = (half - 1) / half * w + b / half
    return jnp.sqrt(var_plus / w)


def split_rhat_from_moments(mom) -> jnp.ndarray:
    """Split-R̂ from streaming :class:`~inplacedhmc_tpu.adapt.warmup.SplitMoments`
    accumulated during sampling — identical statistic to :func:`split_rhat`
    (each chain's two halves are separate sequences) but O(C·D) memory: the
    path to R̂ over every coordinate of a 10k-chain × 1k-dim run whose draws
    were never stored.

    The accumulated sums are centered per chain on ``mom.qref``; the shift
    cancels exactly in both the within-half variances and the between-half
    variance of the means (R̂ is translation-invariant per coordinate only —
    per-CHAIN centers would not cancel — so ``qref`` enters the means)."""
    cnt = jnp.maximum(mom.cnt, 2.0)[:, None, None]     # [2, 1, 1]
    mean = mom.qref[None] + mom.s1 / cnt               # [2, C, D]
    var = (mom.s2 - mom.s1 * mom.s1 / cnt) / (cnt - 1.0)
    var = jnp.maximum(var, 0.0)
    # halves may differ by one draw (odd totals assign the extra draw to the
    # second half): use the mean half length, the same convention as the
    # histogram-sketch estimator (sketch._split_rhat_of_z)
    nbar = jnp.mean(jnp.maximum(mom.cnt, 2.0))
    means = mean.reshape(-1, mean.shape[-1])           # [2C, D]
    w = jnp.mean(var.reshape(-1, var.shape[-1]), axis=0)
    b = nbar * jnp.var(means, axis=0, ddof=1)
    var_plus = (nbar - 1.0) / nbar * w + b / nbar
    rhat = jnp.sqrt(var_plus / w)
    # a mid-run state (checkpoint before the halfway point) has an empty
    # second half: report NaN explicitly instead of 0/0 garbage
    return jnp.where(mom.cnt[1] > 1.0, rhat, jnp.nan)


def _autocov_fft(x: jnp.ndarray) -> jnp.ndarray:
    """Autocovariance along axis 0 via FFT.  ``x``: [N, ...] → [N, ...]."""
    n = x.shape[0]
    xc = x - jnp.mean(x, axis=0, keepdims=True)
    size = 2 * n  # zero-pad to avoid circular correlation
    f = jnp.fft.rfft(xc, size, axis=0)
    acov = jnp.fft.irfft(f * jnp.conj(f), size, axis=0)[:n]
    return acov / n


def _geyer_tau(rho: jnp.ndarray) -> jnp.ndarray:
    """Integrated autocorrelation time from combined autocorrelations
    ``rho`` [L, D]: Geyer pair sums truncated at the first non-positive pair
    and enforced non-increasing (the initial monotone sequence) — the single
    definition shared by the local and sharded estimators."""
    l, d = rho.shape
    n_pairs = l // 2
    p = rho[: 2 * n_pairs].reshape(n_pairs, 2, d).sum(axis=1)
    pos = jnp.cumprod(p > 0, axis=0).astype(bool)
    p = jnp.where(pos, p, 0.0)
    p = jax.lax.cummin(p, axis=0)
    p = jnp.maximum(p, 0.0)
    return jnp.maximum(-1.0 + 2.0 * jnp.sum(p, axis=0), 1e-8)


def ess_bulk(draws: jnp.ndarray, cap: bool = True,
             rank_normalize: bool = False) -> jnp.ndarray:
    """Effective sample size (Geyer initial monotone sequence, split chains).

    ``draws``: [N, C, D] → [D].  Stan-style combined autocorrelation
    ``rho_t = 1 - (W - mean_chain_acov_t) / var_plus``; Geyer pair sums
    ``P_k = rho_{2k} + rho_{2k+1}`` are truncated at the first non-positive
    pair and enforced non-increasing; ``tau = -1 + 2 sum_k P_k``;
    ``ESS = M N / tau``.  Fully jnp (FFT on device), jittable.

    ``cap=True`` clips at the total draw count (the conservative default for
    convergence checks); ``cap=False`` reports the raw ``total/tau``, which
    can legitimately exceed the draw count for antithetic chains — use it
    for throughput benchmarking so near-iid posteriors aren't cap-bound.

    ``rank_normalize=True`` computes the ESS of the rank-normalized draws —
    Stan's ``ess_bulk`` proper (Vehtari et al. 2021), robust to heavy tails;
    :func:`posterior_summary` uses it.  The raw-draw default measures the
    autocorrelation of the actual sample sequence (the throughput quantity
    benchmarks divide by wall time).
    """
    if rank_normalize:
        draws = _rank_normalize(draws)
    n, c, d = draws.shape
    half = n // 2
    x = jnp.concatenate([draws[:half], draws[half:2 * half]], axis=1)  # [half, 2C, D]
    m = x.shape[1]
    acov = _autocov_fft(x)                         # [half, 2C, D] (biased, /half)
    chain_var = acov[0] * half / (half - 1)        # [2C, D]
    w = jnp.mean(chain_var, axis=0)                # [D]
    chain_mean = jnp.mean(x, axis=0)
    b = half * jnp.var(chain_mean, axis=0, ddof=1)
    var_plus = (half - 1) / half * w + b / half    # [D]

    rho = 1.0 - (w[None] - jnp.mean(acov, axis=1)) / var_plus[None]  # [half, D]
    tau = _geyer_tau(rho)
    total = jnp.asarray(m * half, draws.dtype)
    ess = total / tau
    return jnp.minimum(ess, total) if cap else ess


def ess_per_second(draws: jnp.ndarray, wall_s: float) -> jnp.ndarray:
    """Throughput: raw (uncapped) ESS per second — near-iid posteriors
    would otherwise be cap-bound and report draws/s instead."""
    return ess_bulk(draws, cap=False) / wall_s


def _rank_normalize(draws: jnp.ndarray) -> jnp.ndarray:
    """Rank-normalize draws across all chains (Vehtari et al. 2021 §3):
    ranks -> fractional offsets -> inverse normal CDF.  [N, C, D] -> same."""
    n, c, d = draws.shape
    flat = draws.reshape(n * c, d)
    order = jnp.argsort(flat, axis=0)
    ranks = jnp.argsort(order, axis=0).astype(draws.dtype) + 1.0
    frac = (ranks - 0.375) / (n * c + 0.25)   # Blom offsets
    z = jax.scipy.special.ndtri(frac)
    return z.reshape(n, c, d)


def rhat_rank(draws: jnp.ndarray) -> jnp.ndarray:
    """Rank-normalized split-R̂: max of bulk (rank-normalized) and tail
    (folded rank-normalized) R̂ — robust to heavy tails and nonstationary
    variance, per Vehtari et al. (2021)."""
    bulk = split_rhat(_rank_normalize(draws))
    folded = jnp.abs(draws - jnp.median(draws.reshape(-1, draws.shape[-1]),
                                        axis=0))
    tail = split_rhat(_rank_normalize(folded))
    return jnp.maximum(bulk, tail)


def ess_tail(draws: jnp.ndarray) -> jnp.ndarray:
    """Tail ESS: minimum of the ESS of the 5% and 95% quantile indicator
    sequences (Vehtari et al. 2021) — measures tail-exploration efficiency."""
    d = draws.shape[-1]
    flat = draws.reshape(-1, d)
    q05 = jnp.quantile(flat, 0.05, axis=0)
    q95 = jnp.quantile(flat, 0.95, axis=0)
    lo = (draws <= q05[None, None, :]).astype(draws.dtype)
    hi = (draws <= q95[None, None, :]).astype(draws.dtype)
    return jnp.minimum(ess_bulk(lo), ess_bulk(hi))


# ---------------------------------------------------------------------------
# posterior summary table (user-facing; no reference counterpart — the
# reference prints only tree statistics, diagnostics.jl:103-127)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PosteriorSummary:
    """Per-coordinate posterior table; ``str()`` renders it Stan-style."""

    names: list
    mean: np.ndarray
    sd: np.ndarray
    q5: np.ndarray
    q50: np.ndarray
    q95: np.ndarray
    ess_bulk: np.ndarray
    ess_tail: Optional[np.ndarray]
    rhat: np.ndarray

    def __str__(self):
        hdr = (f"{'':>12} {'mean':>9} {'sd':>9} {'5%':>9} {'50%':>9} "
               f"{'95%':>9} {'ess_bulk':>9} {'ess_tail':>9} {'rhat':>7}")
        rows = [hdr]
        for i, nm in enumerate(self.names):
            et = "-" if self.ess_tail is None else f"{self.ess_tail[i]:9.0f}"
            rows.append(
                f"{nm:>12} {self.mean[i]:9.3f} {self.sd[i]:9.3f} "
                f"{self.q5[i]:9.3f} {self.q50[i]:9.3f} {self.q95[i]:9.3f} "
                f"{self.ess_bulk[i]:9.0f} {et:>9} {self.rhat[i]:7.3f}")
        return "\n".join(rows)


def _default_names(d, names):
    if names is None:
        return [f"q[{i}]" for i in range(d)]
    return list(names)


def posterior_summary(draws: jnp.ndarray, names=None) -> PosteriorSummary:
    """Stan-style per-coordinate summary from stored draws ``[N, C, D]``:
    moments, central quantiles, bulk/tail ESS, rank-normalized split-R̂."""
    n, c, d = draws.shape
    flat = np.asarray(draws.reshape(-1, d))
    q5, q50, q95 = np.percentile(flat, [5.0, 50.0, 95.0], axis=0)
    return PosteriorSummary(
        names=_default_names(d, names),
        mean=flat.mean(axis=0), sd=flat.std(axis=0, ddof=1),
        q5=q5, q50=q50, q95=q95,
        ess_bulk=np.asarray(ess_bulk(draws, rank_normalize=True)),
        ess_tail=np.asarray(ess_tail(draws)),
        rhat=np.asarray(rhat_rank(draws)))


def posterior_summary_streamed(sketch, n_chains=None,
                               names=None) -> PosteriorSummary:
    """The same table from a :class:`~inplacedhmc_tpu.sketch.StreamSketch`
    (draw-free runs, ``store_draws=False``): moments and quantiles come from
    the pooled histograms (exact up to binning — quantiles are interpolated
    within bins via :func:`~inplacedhmc_tpu.sketch.quantiles_from_hist`),
    bulk ESS from the lag-window sketch, R̂ from the rank sketch, and tail
    ESS from the two-phase indicator sketch when the run streamed one
    (``None`` otherwise)."""
    from .sketch import (ess_from_sketch, quantiles_from_hist,
                         rank_rhat_from_sketch)

    rk = sketch.rank
    c_sketch = rk.counts.shape[1]
    if n_chains is None:
        n_chains = c_sketch          # derivable: [2, C, D, B] histogram
    elif n_chains != c_sketch:
        raise ValueError(f"n_chains={n_chains} does not match the sketch's "
                         f"chain count {c_sketch}")
    p = np.asarray(jnp.sum(rk.counts, axis=(0, 1))).astype(np.float64)  # [D, B]
    d, b = p.shape
    lo = np.asarray(rk.lo, np.float64)
    width = np.asarray(rk.width, np.float64)
    edges = lo[:, None] + np.arange(b + 1)[None] / b * width[:, None]
    mids = 0.5 * (edges[:, :-1] + edges[:, 1:])
    total = p.sum(-1, keepdims=True)
    # an empty sketch reports NaN consistently across every column (the
    # quantile helper already guards this case)
    w = p / np.maximum(total, 1.0)
    mean = np.where(total[:, 0] > 0, (w * mids).sum(-1), np.nan)
    var = np.where(total[:, 0] > 0,
                   (w * (mids - np.nan_to_num(mean)[:, None]) ** 2).sum(-1),
                   np.nan)
    qs = np.asarray(quantiles_from_hist(rk, [0.05, 0.5, 0.95]))

    ess = ess_from_sketch(sketch.acov, n_chains)
    et = None
    if sketch.tail is not None:
        from .sketch import ess_tail_from_sketch
        et = np.asarray(ess_tail_from_sketch(sketch.tail, n_chains).ess)
    return PosteriorSummary(
        names=_default_names(d, names),
        mean=mean, sd=np.sqrt(var),
        q5=qs[0], q50=qs[1], q95=qs[2],
        ess_bulk=np.asarray(ess.ess), ess_tail=et,
        rhat=np.asarray(rank_rhat_from_sketch(rk)))


# ---------------------------------------------------------------------------
# acceptance-ratio exploration + leapfrog trajectory (diagnostics.jl:129-216)
# ---------------------------------------------------------------------------

def explore_log_acceptance_ratios(model, q, log2_eps, key=None,
                                  metric: Optional[Metric] = None,
                                  n_momenta: int = 20) -> jnp.ndarray:
    """Grid of uncapped log acceptance ratios over step sizes x momenta
    (``diagnostics.jl:138-150``; working, unlike the reference's stale
    version).  Returns ``[len(log2_eps), n_momenta]``."""
    q = jnp.asarray(q)
    dim = q.shape[-1]
    metric = metric or identity_metric(dim, q.dtype)
    key = key if key is not None else jax.random.PRNGKey(0)
    pot = batched_logdensity_and_grad(model.logp)
    ps = sample_momentum(metric, key, (n_momenta, dim), q.dtype)
    qb = jnp.broadcast_to(q[None], (n_momenta, dim))
    z0 = evaluate(pot, qb)
    target = joint_logdensity(metric, z0.logp, ps)

    def ratio_for(eps):
        z1 = leapfrog(pot, metric, PhasePoint(Q=z0, p=ps), eps)
        return joint_logdensity(metric, z1.Q.logp, z1.p) - target

    epss = jnp.asarray([2.0 ** e for e in log2_eps], q.dtype)
    return jax.vmap(ratio_for)(epss)


class TrajectoryPoint(NamedTuple):
    position: int
    q: np.ndarray
    delta: float


def leapfrog_trajectory(model, q, eps, positions, key=None,
                        metric: Optional[Metric] = None,
                        p: Optional[jnp.ndarray] = None):
    """Trace a leapfrog trajectory over integer ``positions`` (must contain 0)
    relative to ``q`` (``diagnostics.jl:203-216``, fixed).  Returns a list of
    :class:`TrajectoryPoint` with Δ = joint density relative to position 0."""
    lo, hi = min(positions), max(positions)
    assert lo <= 0 <= hi, "positions must contain 0"
    q = jnp.asarray(q)
    dim = q.shape[-1]
    metric = metric or identity_metric(dim, q.dtype)
    pot = batched_logdensity_and_grad(model.logp)
    if p is None:
        key = key if key is not None else jax.random.PRNGKey(0)
        p = sample_momentum(metric, key, (1, dim), q.dtype)[0]
    z0 = evaluate(pot, q[None])
    pi0 = float(joint_logdensity(metric, z0.logp, p[None])[0])

    out = {0: TrajectoryPoint(0, np.asarray(q), 0.0)}
    for sgn, count in ((1, hi), (-1, -lo)):
        z = PhasePoint(Q=z0, p=p[None])
        for i in range(1, count + 1):
            z = leapfrog(pot, metric, z, jnp.asarray(sgn * eps, q.dtype))
            delta = float(joint_logdensity(metric, z.Q.logp, z.p)[0]) - pi0
            out[sgn * i] = TrajectoryPoint(sgn * i, np.asarray(z.Q.q[0]), delta)
            if not np.isfinite(delta):
                break
    return [out[i] for i in sorted(out)]

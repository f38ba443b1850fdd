"""Streaming diagnostic sketches: rank-normalized R-hat and bulk ESS with
memory independent of the number of draws.

The reference ships no R-hat/ESS at all (SURVEY.md C16); round 1 added the
stored-draw estimators (:mod:`~inplacedhmc_tpu.diagnostics`) and streaming
split-chain *moments* (split-R-hat only).  This module streams the two
remaining draw-hungry diagnostics:

- **Rank-normalized split-R-hat** (bulk + folded/tail, Vehtari et al. 2021)
  from per-split-chain *histograms*: ``counts [2, C, D, B]``.  The rank-normal
  transform ``z = ndtri(pooled ECDF)`` is a per-coordinate monotone map known
  only at the end of sampling, but each chain half's mean/variance of ``z``
  is a linear functional of its histogram — so exact-up-to-binning rank-R-hat
  needs only ``O(C * D * B)`` memory, not ``O(N * C * D)``.  Memory note:
  at the BASELINE config-5 shape (10k chains x 1002 dims) use a dims subset
  or a small ``bins``; counts are int32.

- **Bulk ESS** from a lag-window autocovariance carry: pooled-over-chains lag
  sums ``[2, L+1, D]`` plus a ring of the last ``L`` centered draws
  ``[L, C, D]``.  Geyer's initial-monotone-sequence estimator is applied to
  lags ``0..L``; if the sequence has not gone negative by lag ``L`` the
  estimate is flagged truncated (ESS then *over*-estimated — raise
  ``max_lag``).  The per-chain mean corrections come from the split sums, so
  the only O(C) state is the ring.

Both sketches update **block-wise**: the sampling driver already materializes
each ``draw_block`` of recorded draws before discarding it (``sample.py``),
so streaming falls out of feeding every block through ``update_stream_sketch``
— no change to the jitted transition loop.  All functions are jittable.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax


@dataclasses.dataclass(frozen=True)
class SketchConfig:
    """Configuration for streaming diagnostic sketches.

    ``bins``: histogram resolution per coordinate (rank-R-hat binning error
    shrinks like 1/bins; 64 is within ~1e-3 of the exact statistic on
    unimodal posteriors).  ``max_lag``: autocovariance window; must exceed
    the largest integrated autocorrelation time tau you expect to resolve
    (tau > ~2*max_lag is flagged, not silently wrong).  ``range_sigmas``:
    histogram support is ``mean +- range_sigmas * sd`` of the cross-chain
    post-warmup positions; values beyond it clip into the end bins.

    ``tail``: also stream tail-ESS (Vehtari et al. 2021: min ESS of the
    ``tail_probs`` quantile-indicator sequences).  The thresholds are not
    known during a streaming pass, so they are frozen from the pooled
    histogram once ``tail_after`` of the draws have arrived and the indicator
    autocovariances stream over the remainder — a two-phase protocol: the
    reported tail ESS covers the last ``1 - tail_after`` of the run (with
    threshold error O(1/sqrt(first-phase draws)), immaterial against the
    indicator-sequence noise).  Requires blockwise updates (``draw_block``).

    ``max_lag`` should be ODD: Geyer's estimator consumes lags in pairs
    ``(2k, 2k+1)``, so an even ``max_lag`` accumulates a final lag it never
    reads."""

    bins: int = 64
    max_lag: int = 63
    range_sigmas: float = 8.0
    tail: bool = True
    tail_after: float = 0.5
    tail_probs: tuple = (0.05, 0.95)


class RankHistSketch(NamedTuple):
    lo: jnp.ndarray       # [D] histogram lower edge per coordinate
    width: jnp.ndarray    # [D] total support width
    counts: jnp.ndarray   # [2, C, D, B] int32 per-half per-chain histograms
    # (per-half draw counts are sums over counts; no separate counter)


class AutocovSketch(NamedTuple):
    qref: jnp.ndarray     # [C, D] fixed per-chain center (sampling start)
    ring: jnp.ndarray     # [L, C, D] last L centered draws, chronological
    s1: jnp.ndarray       # [2, C, D] per-half sums of centered draws
    lag: jnp.ndarray      # [2, L+1, D] per-half lag sums, POOLED over chains
    cnt_lag: jnp.ndarray  # [2, L+1] valid (same-half) pairs per lag
    cnt: jnp.ndarray      # [2] draws per half


class TailSketch(NamedTuple):
    """Second-phase indicator autocovariances for streamed tail ESS."""

    q05: jnp.ndarray      # [D] frozen 5% thresholds
    q95: jnp.ndarray      # [D] frozen 95% thresholds
    lo: AutocovSketch     # over I(x <= q05)
    hi: AutocovSketch     # over I(x <= q95)
    start: jnp.ndarray    # scalar: global draw index where phase 2 began


class StreamSketch(NamedTuple):
    rank: RankHistSketch
    acov: AutocovSketch
    tail: Optional[TailSketch] = None


def init_stream_sketch(q: jnp.ndarray, config: SketchConfig = SketchConfig(),
                       lo: Optional[jnp.ndarray] = None,
                       hi: Optional[jnp.ndarray] = None) -> StreamSketch:
    """``q``: post-warmup positions restricted to the sketched coordinates,
    ``[C, D]``.  Histogram support defaults to the cross-chain
    ``mean +- range_sigmas * sd`` of ``q`` (post-warmup chains are dispersed
    across the posterior, so this covers it with wide margins)."""
    c, d = q.shape
    b, ell = config.bins, config.max_lag
    if b < 2:
        raise ValueError(f"SketchConfig.bins must be >= 2, got {b}")
    if ell < 1:
        raise ValueError(f"SketchConfig.max_lag must be >= 1, got {ell}")
    if not 0.0 < config.tail_after < 1.0:
        raise ValueError(
            f"SketchConfig.tail_after must be in (0, 1), got {config.tail_after}")
    dt = q.dtype
    if lo is None or hi is None:
        m = jnp.mean(q, axis=0)
        sd = jnp.maximum(jnp.std(q, axis=0), 1e-6 * jnp.abs(m) + 1e-12)
        lo = m - config.range_sigmas * sd
        hi = m + config.range_sigmas * sd
    # a degenerate (or user-inverted) support would make bin indices
    # divide-by-zero garbage; floor the width instead
    width = jnp.maximum(jnp.asarray(hi, dt) - jnp.asarray(lo, dt), 1e-12)
    rank = RankHistSketch(
        lo=jnp.asarray(lo, dt), width=width,
        counts=jnp.zeros((2, c, d, b), jnp.int32))
    acov = AutocovSketch(
        qref=q, ring=jnp.zeros((ell, c, d), dt),
        s1=jnp.zeros((2, c, d), dt), lag=jnp.zeros((2, ell + 1, d), dt),
        cnt_lag=jnp.zeros((2, ell + 1), dt), cnt=jnp.zeros((2,), dt))
    return StreamSketch(rank=rank, acov=acov)


def _update_rank(sk: RankHistSketch, draws: jnp.ndarray, offset: int,
                 total: int) -> RankHistSketch:
    n, c, d = draws.shape
    b = sk.counts.shape[-1]
    # clip in FLOAT before the int cast: far-out-of-support values would
    # overflow the float->int32 conversion (implementation-defined in XLA —
    # large positives can come back INT_MIN and land in bin 0); NaNs go to
    # bin 0 explicitly
    pos = (draws - sk.lo) / sk.width * b
    pos = jnp.where(jnp.isnan(pos), 0.0, pos)
    idx = jnp.clip(pos, 0.0, float(b - 1)).astype(jnp.int32)  # [n, C, D]
    halves = ((offset + jnp.arange(n)) >= total // 2).astype(jnp.int32)

    def body(counts, xs):
        ix, h = xs
        onehot = (ix[..., None] == jnp.arange(b)).astype(jnp.int32)
        return counts.at[h].add(onehot), None

    counts, _ = lax.scan(body, sk.counts, (idx, halves))
    return sk._replace(counts=counts)


def _update_acov(sk: AutocovSketch, draws: jnp.ndarray, offset: int,
                 total: int) -> AutocovSketch:
    n, c, d = draws.shape
    ell = sk.ring.shape[0]
    x = draws - sk.qref[None]                              # [n, C, D]
    t = offset + jnp.arange(n)                             # global draw index
    half_start = total // 2
    halves = (t >= half_start).astype(jnp.int32)
    h0 = (halves == 0).astype(x.dtype)[:, None, None]
    s1 = sk.s1.at[0].add(jnp.sum(x * h0, axis=0)) \
              .at[1].add(jnp.sum(x * (1.0 - h0), axis=0))
    cnt = sk.cnt.at[0].add(jnp.sum(halves == 0)).at[1].add(jnp.sum(halves == 1))

    # lag products against the extended sequence [ring tail | this block].
    # xs_ext[j] is draw t = offset - L + j; pair (t, t-l) is valid when
    # t-l >= 0 and both endpoints fall in the same global half.
    xs_ext = jnp.concatenate([sk.ring, x], axis=0)         # [L+n, C, D]
    lag = sk.lag
    cnt_lag = sk.cnt_lag
    for l in range(ell + 1):
        x_past = lax.dynamic_slice_in_dim(xs_ext, ell - l, n, axis=0)
        valid = (t - l) >= 0
        same_half = ((t - l) >= half_start) == (t >= half_start)
        for h in (0, 1):
            sel = (valid & same_half & (halves == h)).astype(x.dtype)
            prod = jnp.sum(jnp.sum(x * x_past, axis=1) * sel[:, None], axis=0)
            lag = lag.at[h, l].add(prod)
            cnt_lag = cnt_lag.at[h, l].add(jnp.sum(sel))
    ring = xs_ext[-ell:] if n >= ell else jnp.concatenate(
        [sk.ring[n:], x], axis=0)
    return sk._replace(ring=ring, s1=s1, lag=lag, cnt_lag=cnt_lag, cnt=cnt)


def update_stream_sketch(sk: StreamSketch, draws: jnp.ndarray, offset: int,
                         total: int) -> StreamSketch:
    """Fold one block of recorded draws ``[n, C, D]`` into the sketch.
    ``offset``/``total`` locate the block inside the whole run (draw index
    ``offset + i`` of ``total``), assigning draws to split halves."""
    tail = sk.tail
    if tail is not None:
        dt = draws.dtype
        off_t = offset - tail.start
        tot_t = total - tail.start
        tail = tail._replace(
            lo=_update_acov(tail.lo, (draws <= tail.q05[None, None]).astype(dt),
                            off_t, tot_t),
            hi=_update_acov(tail.hi, (draws <= tail.q95[None, None]).astype(dt),
                            off_t, tot_t))
    return StreamSketch(rank=_update_rank(sk.rank, draws, offset, total),
                        acov=_update_acov(sk.acov, draws, offset, total),
                        tail=tail)


def quantiles_from_hist(sk: RankHistSketch, qs) -> jnp.ndarray:
    """Pooled posterior quantiles from the histogram, interpolated within
    bins.  ``qs``: sequence of probabilities -> ``[len(qs), D]``.  Coordinates
    whose histogram is still EMPTY report NaN (an argmax over an all-False
    ECDF comparison would silently return the lower support edge)."""
    p = jnp.sum(sk.counts, axis=(0, 1)).astype(sk.lo.dtype)   # [D, B]
    d, b = p.shape
    total = jnp.sum(p, axis=-1, keepdims=True)
    cum = jnp.cumsum(p, axis=-1) / jnp.maximum(total, 1.0)    # [D, B]
    edges = sk.lo[:, None] + jnp.arange(b + 1) / b * sk.width[:, None]
    qs = jnp.asarray(qs, sk.lo.dtype)
    empty = total[:, 0] == 0                                  # [D]

    def one(q):
        j = jnp.argmax(cum >= q, axis=-1)                     # [D]
        c1 = jnp.take_along_axis(cum, j[:, None], axis=-1)[:, 0]
        c0 = jnp.where(j > 0,
                       jnp.take_along_axis(cum, jnp.maximum(j - 1, 0)[:, None],
                                           axis=-1)[:, 0], 0.0)
        e0 = jnp.take_along_axis(edges, j[:, None], axis=-1)[:, 0]
        e1 = jnp.take_along_axis(edges, (j + 1)[:, None], axis=-1)[:, 0]
        frac = (q - c0) / jnp.maximum(c1 - c0, 1e-12)
        return jnp.where(empty, jnp.nan, e0 + frac * (e1 - e0))

    return jax.vmap(one)(qs)


def activate_tail(sk: StreamSketch, config: SketchConfig,
                  start: int) -> StreamSketch:
    """Begin tail-ESS phase 2: freeze the ``config.tail_probs`` (default
    5%/95%) thresholds from the pooled histogram accumulated so far and start
    indicator autocovariance sketches for the draws from global index
    ``start`` on."""
    qlohi = quantiles_from_hist(sk.rank, jnp.asarray(list(config.tail_probs)))
    c, d = sk.acov.qref.shape
    ell = sk.acov.ring.shape[0]
    dt = sk.acov.qref.dtype

    def ind_sketch():
        return AutocovSketch(
            qref=jnp.zeros((c, d), dt), ring=jnp.zeros((ell, c, d), dt),
            s1=jnp.zeros((2, c, d), dt), lag=jnp.zeros((2, ell + 1, d), dt),
            cnt_lag=jnp.zeros((2, ell + 1), dt), cnt=jnp.zeros((2,), dt))

    return sk._replace(tail=TailSketch(
        q05=qlohi[0], q95=qlohi[1], lo=ind_sketch(), hi=ind_sketch(),
        start=jnp.asarray(start, jnp.int32)))


def ess_tail_from_sketch(ts: TailSketch, n_chains: int,
                         cap: bool = True) -> StreamESS:
    """Streamed tail ESS: min of the bulk-ESS of the two frozen-threshold
    quantile-indicator sequences (covers the phase-2 draws only)."""
    lo = ess_from_sketch(ts.lo, n_chains, cap=cap)
    hi = ess_from_sketch(ts.hi, n_chains, cap=cap)
    take_lo = lo.ess <= hi.ess
    return StreamESS(ess=jnp.minimum(lo.ess, hi.ess),
                     tau=jnp.where(take_lo, lo.tau, hi.tau),
                     truncated=jnp.where(take_lo, lo.truncated, hi.truncated))


# ---------------------------------------------------------------------------
# finalizers
# ---------------------------------------------------------------------------

def _split_rhat_of_z(counts: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Split-R-hat where each sequence's values are the per-bin scores ``z``
    weighted by its histogram.  ``counts`` [2, C, D, B], ``z`` [D, B] -> [D]."""
    cf = counts.astype(z.dtype)
    n = jnp.maximum(jnp.sum(cf, axis=-1), 1.0)             # [2, C, D]
    mean = jnp.einsum("hcdb,db->hcd", cf, z) / n
    m2 = jnp.einsum("hcdb,db->hcd", cf, z * z) / n
    var = jnp.maximum(m2 - mean * mean, 0.0) * n / jnp.maximum(n - 1.0, 1.0)
    half = jnp.mean(n)
    means = mean.reshape(-1, mean.shape[-1])               # [2C, D]
    w = jnp.mean(var.reshape(-1, var.shape[-1]), axis=0)
    b = half * jnp.var(means, axis=0, ddof=1)
    var_plus = (half - 1.0) / half * w + b / half
    return jnp.sqrt(var_plus / jnp.maximum(w, 1e-30))


def _blom_z(avg_rank: jnp.ndarray, total: jnp.ndarray) -> jnp.ndarray:
    frac = (avg_rank - 0.375) / (total + 0.25)
    frac = jnp.clip(frac, 1e-7, 1.0 - 1e-7)
    return jax.scipy.special.ndtri(frac)


def rank_rhat_from_sketch(sk: RankHistSketch) -> jnp.ndarray:
    """Rank-normalized split-R-hat (max of bulk and folded/tail) from the
    histogram sketch — the streamed analog of
    :func:`~inplacedhmc_tpu.diagnostics.rhat_rank`.  Values within a bin share
    their average pooled rank (midrank), the standard treatment of ties; the
    folded statistic folds bins around the pooled median bin midpoint."""
    counts = sk.counts
    b = counts.shape[-1]
    p = jnp.sum(counts, axis=(0, 1)).astype(sk.lo.dtype)   # [D, B] pooled
    d = p.shape[0]
    total = jnp.sum(p, axis=-1, keepdims=True)
    cum = jnp.cumsum(p, axis=-1)
    avg_rank = cum - p + (p + 1.0) / 2.0                   # midranks, 1-based
    z_bulk = _blom_z(avg_rank, total)
    bulk = _split_rhat_of_z(counts, z_bulk)

    # folded: |mid - median| ranks; median = midpoint of the bin where the
    # pooled ECDF crosses 1/2.  Bins are evenly spaced, so mirror pairs
    # around the median bin fold onto EXACTLY the same value — rank by the
    # integer distance |k - med_bin| (exact ties by construction; float
    # |mids - med| would break ties by rounding noise) and give tied bins
    # their shared average pooled rank, the same midrank treatment bins
    # already get internally.  Without this, a mirror pair gets left-then-
    # right distinct ranks, injecting the sign information folding removes.
    med_bin = jnp.argmax(cum >= 0.5 * total, axis=-1)      # [D]
    y = jnp.abs(jnp.arange(b)[None, :] - med_bin[:, None])  # [D, B] int
    order = jnp.argsort(y, axis=-1)
    p_sorted = jnp.take_along_axis(p, order, axis=-1)
    y_sorted = jnp.take_along_axis(y, order, axis=-1)
    # group id per sorted position = # of distinct-y boundaries before it
    newgrp = jnp.concatenate(
        [jnp.ones((d, 1), jnp.int32),
         (y_sorted[:, 1:] != y_sorted[:, :-1]).astype(jnp.int32)], axis=-1)
    gidx = jnp.cumsum(newgrp, axis=-1) - 1                 # [D, B]
    onehot = (gidx[..., None] == jnp.arange(b)).astype(p.dtype)  # [D, B, G]
    group_tot = jnp.einsum("dbg,db->dg", onehot, p_sorted)
    group_before = jnp.cumsum(group_tot, axis=-1) - group_tot
    rank_sorted = (jnp.take_along_axis(group_before, gidx, axis=-1)
                   + (jnp.take_along_axis(group_tot, gidx, axis=-1) + 1.0) / 2.0)
    rank_fold = jnp.zeros_like(rank_sorted)
    rank_fold = jnp.put_along_axis(rank_fold, order, rank_sorted, axis=-1,
                                   inplace=False)
    z_tail = _blom_z(rank_fold, total)
    tail = _split_rhat_of_z(counts, z_tail)
    return jnp.maximum(bulk, tail)


class StreamESS(NamedTuple):
    ess: jnp.ndarray        # [D]
    tau: jnp.ndarray        # [D] integrated autocorrelation time
    truncated: jnp.ndarray  # [D] bool: window ended before Geyer truncation
                            # (ess is then an over-estimate; raise max_lag)


def ess_from_sketch(sk: AutocovSketch, n_chains: int,
                    cap: bool = True) -> StreamESS:
    """Bulk ESS from the lag-window sketch (Stan/Geyer estimator restricted
    to lags ``0..max_lag``) — the streamed analog of
    :func:`~inplacedhmc_tpu.diagnostics.ess_bulk`.

    Per-half-chain lag sums are pooled over chains; the mean correction uses
    ``E[sum_t x_t x_{t-l}] - cnt_l * mu_c^2`` per chain, whose chain sum is
    exactly accumulable from the pooled lag sums and per-chain ``s1``."""
    c = n_chains
    dt = sk.lag.dtype
    n = jnp.maximum(sk.cnt, 2.0)[:, None]                  # [2, 1]
    mu = sk.s1 / n[..., None]                              # [2, C, D]
    mu2_sum = jnp.sum(mu * mu, axis=1)                     # [2, D]
    # acov[h, l, d] = mean over chains of per-chain lag-l autocovariance
    # (biased /n normalization, matching _autocov_fft)
    cl = sk.cnt_lag[..., None] / c                         # per-chain pairs
    acov = (sk.lag / c - cl * mu2_sum[:, None]) / n[..., None]  # [2, L+1, D]
    chain_var = acov[:, 0] * n / jnp.maximum(n - 1.0, 1.0)      # [2, D]
    w = jnp.mean(chain_var, axis=0)                        # [D]
    # between-half-chain variance of means needs per-chain means: [2C, D]
    means = (sk.qref[None] + mu).reshape(2 * c, -1)
    half = jnp.mean(n)
    b = half * jnp.var(means, axis=0, ddof=1)
    var_plus = jnp.maximum((half - 1.0) / half * w + b / half, 1e-30)

    rho = 1.0 - (w[None] - jnp.mean(acov, axis=0)) / var_plus[None]  # [L+1, D]
    ell1 = rho.shape[0]
    n_pairs = ell1 // 2
    d = rho.shape[-1]
    p = rho[: 2 * n_pairs].reshape(n_pairs, 2, d).sum(axis=1)
    pos = jnp.cumprod(p > 0, axis=0).astype(bool)
    truncated = pos[-1]                                    # window exhausted
    p = jnp.where(pos, p, 0.0)
    p = lax.cummin(p, axis=0)
    p = jnp.maximum(p, 0.0)
    tau = jnp.maximum(-1.0 + 2.0 * jnp.sum(p, axis=0), 1e-8)
    total = jnp.asarray(2 * c, dt) * half
    ess = total / tau
    if cap:
        ess = jnp.minimum(ess, total)
    return StreamESS(ess=ess, tau=tau, truncated=truncated)

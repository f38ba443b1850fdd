"""Gaussian kinetic energies (diagonal and dense) and mass-matrix estimation.

TPU-native equivalent of ``GaussianKineticEnergy``
(``/root/reference/src/hamiltonian.jl:33-74``) and the fused regularized
covariance estimator (``hamiltonian.jl:77-189``).  The reference's hand-written
SIMD one-pass Welford kernel becomes a single fused XLA reduction; the dense
(``Symmetric``) path — partially broken in the reference
(``hamiltonian.jl:104-106`` is a dead method) — is implemented here in full.

Metric arrays broadcast over the chains axis: shape ``[D]`` (one shared metric,
as produced by pooled cross-chain adaptation) or ``[C, D]`` (independent
per-chain adaptation, the reference's ``threaded_mcmc`` behavior).
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax
import jax.numpy as jnp


class DiagMetric(NamedTuple):
    """Diagonal Gaussian kinetic energy.

    ``inv`` is ``M⁻¹`` (the estimated posterior variances); ``sqrt_mass`` is
    ``W = M^{1/2} = (M⁻¹)^{-1/2}``, cached for momentum draws exactly like the
    reference caches ``W`` (``hamiltonian.jl:50-57``).
    """

    inv: jnp.ndarray        # [..., D]
    sqrt_mass: jnp.ndarray  # [..., D]


class DenseMetric(NamedTuple):
    """Dense Gaussian kinetic energy for correlated posteriors.

    ``inv`` is ``M⁻¹`` (regularized sample covariance); ``mass_chol`` is the
    lower Cholesky factor ``L`` with ``M = L Lᵀ``, used for momentum draws.
    """

    inv: jnp.ndarray        # [..., D, D]
    mass_chol: jnp.ndarray  # [..., D, D]


class LowRankMetric(NamedTuple):
    """Low-rank-plus-diagonal kinetic energy for large-D correlated posteriors.

    ``M⁻¹ = S (I + U diag(w) Uᵀ) S`` with ``S = diag(sqrt(diag_inv))`` and
    ``U`` orthonormal ``[D, r]`` — the top-``r`` principal directions of the
    *whitened* warmup draws, ``w = λ - 1`` their excess eigenvalues.  Every
    kinetic operation is O(D·r) (two thin matmuls — the natural TPU fit)
    instead of the dense path's O(D²); momentum draws need no Cholesky:
    ``p = S⁻¹ (ξ + U diag(1/√(1+w) − 1) Uᵀ ξ)`` is exact because for
    orthonormal ``U``, ``(I + U a Uᵀ)² = I + U((1+a)²−1)Uᵀ``.

    TPU-native extension of the reference's dense ``Symmetric`` option
    (``warmup.jl:217-234``) to the D≈10³ regime (stochastic volatility,
    BASELINE config 5).
    """

    diag_inv: jnp.ndarray   # [D]   diagonal part of M⁻¹ (whitening scales²)
    u: jnp.ndarray          # [D, r] orthonormal principal directions
    w: jnp.ndarray          # [r]   excess eigenvalues (> -1)


Metric = Union[DiagMetric, DenseMetric, LowRankMetric]


def identity_metric(dim: int, dtype=jnp.float32, m_inv: float = 1.0) -> DiagMetric:
    """Identity (scaled) starting metric (``hamiltonian.jl:63-74``)."""
    inv = jnp.full((dim,), m_inv, dtype=dtype)
    return DiagMetric(inv=inv, sqrt_mass=1.0 / jnp.sqrt(inv))


def diag_metric(inv: jnp.ndarray) -> DiagMetric:
    return DiagMetric(inv=inv, sqrt_mass=1.0 / jnp.sqrt(inv))


def dense_metric(inv: jnp.ndarray) -> DenseMetric:
    """Dense metric from ``M⁻¹``.  The momentum-draw factor is built by
    factoring ``M⁻¹`` DIRECTLY: ``L = chol(M⁻¹)``, ``A = L⁻ᵀ`` satisfies
    ``A Aᵀ = (L Lᵀ)⁻¹ = M``.  The previous invert-then-Cholesky form squared
    the condition number — in f32 it returned an all-NaN factor (silently
    frozen chains) once cond(M⁻¹) exceeded ~1e7, a realistic spread for
    unscaled correlated posteriors; factoring first moves that cliff to the
    PSD limit of ``M⁻¹`` itself."""
    sym = 0.5 * (inv + jnp.swapaxes(inv, -1, -2))
    l = jnp.linalg.cholesky(sym)
    eye = jnp.broadcast_to(jnp.eye(inv.shape[-1], dtype=inv.dtype), inv.shape)
    l_inv = jax.scipy.linalg.solve_triangular(l, eye, lower=True)
    return DenseMetric(inv=inv, mass_chol=jnp.swapaxes(l_inv, -1, -2))


def kinetic_energy(metric: Metric, p: jnp.ndarray) -> jnp.ndarray:
    """``K(p) = ½ pᵀ M⁻¹ p`` (``kinetic_energy.jl:14-24``).  ``p``: [C, D] → [C].

    The dense product runs at explicit ``HIGH`` (3-pass bf16, f32-grade):
    K is a STATIONARITY surface — it sets the multinomial weights and must
    match the momentum-refresh distribution — so a 1-pass product's ~0.05-nat
    deterministic error is not acceptable, while the global f32 default's
    6-pass product doubles the per-leaf MXU cost for ~1e-6-nat gains
    (docs/DESIGN.md #13/#14)."""
    if isinstance(metric, DiagMetric):
        return 0.5 * jnp.sum(p * metric.inv * p, axis=-1)
    if isinstance(metric, LowRankMetric):
        y = p * jnp.sqrt(metric.diag_inv)
        yu = y @ metric.u
        return 0.5 * (jnp.sum(y * y, axis=-1)
                      + jnp.sum(metric.w * yu * yu, axis=-1))
    return 0.5 * jnp.einsum("...i,...ij,...j->...", p, metric.inv, p,
                            precision=jax.lax.Precision.HIGH)


def psharp(metric: Metric, p: jnp.ndarray) -> jnp.ndarray:
    """``p♯ = M⁻¹ p``: the integrator's q-update and the U-turn diagnostic
    (``kinetic_energy.jl:31-46``).  The dense product runs at explicit
    ``HIGH`` (3-pass bf16, f32-grade): any deterministic odd map preserves
    EXACTNESS (reversible volume-preserving shear), but a 1-pass product's
    error is ~1e-2 ABSOLUTE in units of the matvec's largest components —
    under an ill-conditioned metric (a mid-warmup transient estimate
    reaches cond ~1e3) that error lands O(1)-relative on the STIFF
    coordinates and craters acceptance (measured: DA collapse to eps ~5e-4
    in the first dense window at 10240 x 1002, DESIGN #14).  3 passes
    restore f32-grade at half the global f32 default's 6-pass cost."""
    prec = jax.lax.Precision.HIGH
    if isinstance(metric, DiagMetric):
        return metric.inv * p
    if isinstance(metric, LowRankMetric):
        s = jnp.sqrt(metric.diag_inv)
        y = p * s
        return (y + jnp.matmul((y @ metric.u) * metric.w, metric.u.T,
                               precision=prec)) * s
    return jnp.einsum("...ij,...j->...i", metric.inv, p, precision=prec)


def sample_momentum(metric: Metric, key, shape, dtype) -> jnp.ndarray:
    """Draw ``p ~ N(0, M)`` (``kinetic_energy.jl:58-64``).  ``shape``: [C, D].
    The dense Cholesky application runs at explicit ``HIGHEST``: the refresh
    distribution must match ``exp(-K)`` (once per transition — negligible
    cost next to the per-leaf products)."""
    xi = jax.random.normal(key, shape, dtype)
    if isinstance(metric, DiagMetric):
        return metric.sqrt_mass * xi
    if isinstance(metric, LowRankMetric):
        a = 1.0 / jnp.sqrt(1.0 + metric.w) - 1.0
        return (xi + ((xi @ metric.u) * a) @ metric.u.T) \
            / jnp.sqrt(metric.diag_inv)
    return jnp.einsum("...ij,...j->...i", metric.mass_chol, xi,
                      precision=jax.lax.Precision.HIGHEST)


def regularized_variance(draws: jnp.ndarray, lam, pooled: bool = False,
                         axis_name: str | None = None) -> jnp.ndarray:
    """Regularized per-coordinate variance of warmup draws.

    Matches the reference's estimator (``hamiltonian.jl:119-189``):
    ``M⁻¹ = var(q) · N/(N+λ) + 1e-3 · λ/(N+λ)`` with unbiased sample variance.
    (The docstring at ``warmup.jl:223-225`` claims shrinkage toward the median
    diagonal; the *code* shrinks toward the constant ``1e-3`` — we follow the
    code, which matches DynamicHMC's ``regularize_M⁻¹``.)

    ``draws``: [N, C, D].  With ``pooled=False`` returns a per-chain [C, D]
    estimate (the reference's independent-chain behavior); with ``pooled=True``
    returns a single [D] estimate from all chains — and, when ``axis_name`` is
    given inside a ``shard_map``, from all devices via ``psum``.
    """
    n = draws.shape[0]
    if pooled:
        # Two-pass (centered) moments: the one-pass form s2 - cnt*mean^2
        # cancels catastrophically in f32 for |mean|/sd over ~4e3 and can
        # round the variance negative (=> NaN sqrt_mass, silently frozen
        # chains).  The mean is psum'd first, then the centered second
        # moment — one extra collective, both O(D).
        cnt = jnp.asarray(n * draws.shape[1], draws.dtype)
        s1 = jnp.sum(draws, axis=(0, 1))
        if axis_name is not None:
            cnt = jax.lax.psum(cnt, axis_name)
            s1 = jax.lax.psum(s1, axis_name)
        mean = s1 / cnt
        c = draws - mean
        s2c = jnp.sum(c * c, axis=(0, 1))
        if axis_name is not None:
            s2c = jax.lax.psum(s2c, axis_name)
        var = s2c / (cnt - 1)
        n_eff = cnt
    else:
        var = jnp.var(draws, axis=0, ddof=1)  # [C, D]
        n_eff = jnp.asarray(n, draws.dtype)
    return _regularize(var, n_eff, lam, draws.dtype)


def estimate_diag_metric(draws: jnp.ndarray, lam, pooled: bool = False,
                         axis_name: str | None = None) -> DiagMetric:
    """Diagonal metric re-estimate at the end of a tuning window (``warmup.jl:308-310``)."""
    return diag_metric(regularized_variance(draws, lam, pooled, axis_name))


def regularized_cov(draws: jnp.ndarray, lam, pooled: bool = True,
                    axis_name: str | None = None) -> jnp.ndarray:
    """Regularized covariance for the dense (``Symmetric``) metric path.

    ``M⁻¹ = cov(q) · N/(N+λ) + 1e-3 · λ/(N+λ) · I`` — the dense analog of
    :func:`regularized_variance` (the reference's ``TuningNUTS{Symmetric}``
    option, ``warmup.jl:217-234``).
    ``draws``: [N, C, D] → [D, D] (pooled) or [C, D, D] (per chain).
    """
    n = draws.shape[0]
    d = draws.shape[-1]
    if pooled:
        # Two-pass centered Gram (see regularized_variance: the one-pass
        # s2 - cnt*mean*mean^T form loses the diagonal to f32 cancellation
        # for large |mean|/sd).
        cnt = jnp.asarray(n * draws.shape[1], draws.dtype)
        flat = draws.reshape(-1, d)
        s1 = jnp.sum(flat, axis=0)
        if axis_name is not None:
            cnt = jax.lax.psum(cnt, axis_name)
            s1 = jax.lax.psum(s1, axis_name)
        mean = s1 / cnt
        flatc = flat - mean
        # preconditioner moments tolerate bf16 (~1e-2 relative) — opt out of
        # the package-wide f32 matmul default for the big gram products
        s2 = jnp.matmul(flatc.T, flatc, precision=jax.lax.Precision.DEFAULT)
        if axis_name is not None:
            s2 = jax.lax.psum(s2, axis_name)
        cov = s2 / (cnt - 1)
        n_eff = cnt
    else:
        mean = jnp.mean(draws, axis=0)                       # [C, D]
        c = draws - mean[None]
        cov = jnp.einsum("nci,ncj->cij", c, c,
                         precision=jax.lax.Precision.DEFAULT) / (n - 1)
        n_eff = jnp.asarray(n, draws.dtype)
    eye = jnp.eye(d, dtype=draws.dtype)
    return _regularize(cov, n_eff, lam, draws.dtype,
                       target=jnp.asarray(1e-3, draws.dtype) * eye)


def estimate_dense_metric(draws: jnp.ndarray, lam, pooled: bool = True,
                          axis_name: str | None = None) -> DenseMetric:
    return dense_metric(regularized_cov(draws, lam, pooled, axis_name))


def _regularize(var, n_eff, lam, dtype, target=None):
    """``var·N/(N+λ) + target·λ/(N+λ)`` — the single definition of the
    reference's shrinkage (``hamiltonian.jl:119-189``); ``target`` defaults
    to the scalar 1e-3 (diag) and is ``1e-3·I`` for covariances."""
    lam = jnp.asarray(lam, dtype)
    if target is None:
        target = jnp.asarray(1e-3, dtype)
    return var * (n_eff / (n_eff + lam)) + target * (lam / (n_eff + lam))


def moments_variance(cnt, s1, s2, lam, axis_name: str | None = None):
    """Regularized variance from streamed moments centered on a reference
    position: ``s1 = Σ (q - qref)``, ``s2 = Σ (q - qref)²`` accumulated inside
    the tuning scan — O(D) carry instead of storing the ``[N, C, D]`` window
    (the 10k-chain × 1k-dim operating point cannot hold its draws).  The
    reference center keeps the one-pass cancellation harmless: the error is
    relative to ``|mean - qref|/sd``, which is O(1) for a window-start center,
    not the raw ``|mean|/sd`` that bit the unstreamed one-pass form."""
    if axis_name is not None:
        cnt = jax.lax.psum(cnt, axis_name)
        s1 = jax.lax.psum(s1, axis_name)
        s2 = jax.lax.psum(s2, axis_name)
    mu = s1 / cnt
    var = jnp.maximum((s2 - cnt * mu * mu) / (cnt - 1), 1e-10)
    return _regularize(var, cnt, lam, s1.dtype)


def moments_cov(cnt, s1, gram, lam, axis_name: str | None = None):
    """Regularized covariance from streamed moments (see
    :func:`moments_variance`); ``gram = Σ (q - qref)(q - qref)ᵀ``."""
    if axis_name is not None:
        cnt = jax.lax.psum(cnt, axis_name)
        s1 = jax.lax.psum(s1, axis_name)
        gram = jax.lax.psum(gram, axis_name)
    d = s1.shape[0]
    cov = _cov_from_moments(cnt, s1, gram)
    eye = jnp.eye(d, dtype=s1.dtype)
    return _regularize(cov, cnt, lam, s1.dtype,
                       target=jnp.asarray(1e-3, s1.dtype) * eye)


def _cov_from_moments(cnt, s1, gram):
    """Centered covariance from qref-centered one-pass moments, with the
    cancellation guards: diagonal clamp plus a RELATIVE symmetric jitter
    (1e-6 of the mean variance) so off-diagonal rounding noise cannot leave
    the matrix indefinite — ``dense_metric`` takes a Cholesky of this, and a
    single negative eigenvalue would silently NaN the whole factor."""
    mu = s1 / cnt
    cov = (gram - cnt * jnp.outer(mu, mu)) / (cnt - 1)
    cov = cov + jnp.diag(jnp.maximum(1e-10 - jnp.diag(cov), 0.0))
    jitter = 1e-6 * jnp.mean(jnp.diag(cov))
    return cov + jitter * jnp.eye(cov.shape[-1], dtype=cov.dtype)


def _low_rank_tail(cov_w, diag_inv, cnt, lam, rank: int) -> LowRankMetric:
    """Shared tail of the stored-draws and streamed-moments low-rank
    estimators: eigendecompose the whitened covariance, floor + shrink the
    eigenvalues toward 1 with the reference's ``N/(N+λ)`` weight, keep the
    ``rank`` directions most different from identity (by ``|log λ|``, so
    strongly contracted directions count too)."""
    lam = jnp.asarray(lam, cov_w.dtype)
    evals, evecs = jnp.linalg.eigh(cov_w)
    evals = jnp.maximum(evals, 1e-6)
    evals = evals * (cnt / (cnt + lam)) + lam / (cnt + lam)
    order = jnp.argsort(jnp.abs(jnp.log(evals)))[::-1][:rank]
    u = jnp.take(evecs, order, axis=1)
    w = jnp.take(evals, order) - 1.0
    return LowRankMetric(diag_inv=diag_inv, u=u, w=w)


def low_rank_metric_from_moments(cnt, s1, gram, lam, rank: int,
                                 axis_name: str | None = None) -> LowRankMetric:
    """Low-rank+diag metric from streamed qref-centered moments — the EXACT
    analog of :func:`estimate_low_rank_metric` built without stored draws:
    raw covariance from the moments, regularized variances for the diagonal,
    whitened RAW covariance for the eigenbasis.  (An earlier version
    eigendecomposed the already-regularized covariance and shrank its
    eigenvalues AGAIN — double regularization that understated the principal
    directions whenever ``lam`` was not tiny.)"""
    if axis_name is not None:
        cnt = jax.lax.psum(cnt, axis_name)
        s1 = jax.lax.psum(s1, axis_name)
        gram = jax.lax.psum(gram, axis_name)
    cov = _cov_from_moments(cnt, s1, gram)
    var = jnp.maximum(jnp.diag(cov), 1e-10)
    diag_inv = _regularize(var, cnt, lam, s1.dtype)
    sc = jnp.sqrt(diag_inv)
    cov_w = cov / sc[:, None] / sc[None, :]
    return _low_rank_tail(cov_w, diag_inv, cnt, lam, rank)


def estimate_low_rank_metric(draws: jnp.ndarray, lam, rank: int,
                             axis_name: str | None = None) -> LowRankMetric:
    """Low-rank+diag metric from a tuning window's draws (always pooled —
    a per-chain [C, D, r] eigenbasis would defeat the memory point).

    Diagonal part = the regularized variances (:func:`regularized_variance`);
    low-rank part = the top-``rank`` eigenpairs (by |log λ|, so strongly
    *contracted* directions count too) of the whitened draw covariance,
    eigenvalues shrunk toward 1 with the same ``N/(N+λ)`` weight the
    reference applies to variances (``hamiltonian.jl:155-159``).  One [D, D]
    Gram matmul + one ``eigh`` per window; cross-device moments via ``psum``.
    """
    n, c, d = draws.shape
    # one pass over the draws: pooled mean/variance (no second reduction via
    # regularized_variance — under shard_map that cost two extra psums and a
    # full O(N·C·D) re-read per tuning window)
    cnt = jnp.asarray(n * c, draws.dtype)
    s1 = jnp.sum(draws, axis=(0, 1))
    if axis_name is not None:
        cnt = jax.lax.psum(cnt, axis_name)
        s1 = jax.lax.psum(s1, axis_name)
    mean = s1 / cnt
    ctr = draws - mean
    s2c = jnp.sum(ctr * ctr, axis=(0, 1))
    if axis_name is not None:
        s2c = jax.lax.psum(s2c, axis_name)
    diag_inv = _regularize(s2c / (cnt - 1), cnt, lam, draws.dtype)
    xw = ctr / jnp.sqrt(diag_inv)
    gram = jnp.einsum("ncd,nce->de", xw, xw,
                      precision=jax.lax.Precision.DEFAULT)  # preconditioner
    if axis_name is not None:
        gram = jax.lax.psum(gram, axis_name)
    cov_w = gram / (cnt - 1)
    return _low_rank_tail(cov_w, diag_inv, cnt, lam, rank)

"""Metric / regularized-estimator unit tests (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inplacedhmc_tpu.core.metric import (dense_metric, diag_metric,
                                         estimate_dense_metric,
                                         estimate_diag_metric, kinetic_energy,
                                         psharp, regularized_cov,
                                         regularized_variance, sample_momentum)


def test_regularized_variance_matches_reference_formula():
    """regs^2 = var_unbiased * N/(N+lam) + 1e-3 * lam/(N+lam)
    (hamiltonian.jl:155-159 with mulreg/addreg)."""
    rng = np.random.default_rng(0)
    draws = rng.normal(size=(40, 3, 5)) * rng.gamma(2.0, size=(1, 1, 5))
    lam = 5.0 / 40
    got = np.asarray(regularized_variance(jnp.asarray(draws), lam))
    n = 40
    want = draws.var(axis=0, ddof=1) * (n / (n + lam)) + 1e-3 * (lam / (n + lam))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_pooled_variance_pools_chains():
    rng = np.random.default_rng(1)
    draws = rng.normal(size=(30, 8, 4))
    lam = 0.2
    got = np.asarray(regularized_variance(jnp.asarray(draws), lam, pooled=True))
    n = 30 * 8
    flat = draws.reshape(-1, 4)
    want = flat.var(axis=0, ddof=1) * (n / (n + lam)) + 1e-3 * (lam / (n + lam))
    np.testing.assert_allclose(got, want, rtol=1e-10)
    assert got.shape == (4,)


def test_regularized_cov_formula():
    rng = np.random.default_rng(2)
    draws = rng.normal(size=(50, 4, 3))
    lam = 0.1
    got = np.asarray(regularized_cov(jnp.asarray(draws), lam, pooled=True))
    flat = draws.reshape(-1, 3)
    n = flat.shape[0]
    want = np.cov(flat.T, ddof=1) * (n / (n + lam)) + 1e-3 * (lam / (n + lam)) * np.eye(3)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_momentum_samples_have_mass_covariance():
    """p ~ N(0, M) with M = inv(M^-1) (kinetic_energy.jl:58-64)."""
    d = 3
    rng = np.random.default_rng(3)
    a = rng.normal(size=(d, d)) * 0.4 + np.eye(d)
    inv = a @ a.T
    for metric in (diag_metric(jnp.asarray(np.diag(inv))), dense_metric(jnp.asarray(inv))):
        p = sample_momentum(metric, jax.random.PRNGKey(0), (200_000, d), jnp.float64)
        emp = np.cov(np.asarray(p).T)
        inv_m = np.asarray(metric.inv)
        mass = np.linalg.inv(np.diag(inv_m) if inv_m.ndim == 1 else inv_m)
        np.testing.assert_allclose(emp, mass, atol=0.05 * np.abs(mass).max())


def test_kinetic_and_psharp_consistency():
    d = 4
    rng = np.random.default_rng(4)
    a = rng.normal(size=(d, d)) * 0.3 + np.eye(d)
    inv = jnp.asarray(a @ a.T)
    p = jnp.asarray(rng.normal(size=(7, d)))
    m = dense_metric(inv)
    ke = np.asarray(kinetic_energy(m, p))
    ps = np.asarray(psharp(m, p))
    np.testing.assert_allclose(ke, 0.5 * np.sum(np.asarray(p) * ps, axis=-1), rtol=1e-12)
    # diag agrees with dense when the matrix is diagonal
    dm = diag_metric(jnp.asarray(np.diag(np.asarray(inv))))
    ddm = dense_metric(jnp.asarray(np.diag(np.diag(np.asarray(inv)))))
    np.testing.assert_allclose(np.asarray(kinetic_energy(dm, p)),
                               np.asarray(kinetic_energy(ddm, p)), rtol=1e-10)


def test_per_chain_metric_broadcasts():
    c, d = 5, 3
    rng = np.random.default_rng(5)
    inv = jnp.asarray(rng.gamma(2.0, size=(c, d)))
    m = diag_metric(inv)
    p = jnp.asarray(rng.normal(size=(c, d)))
    ke = np.asarray(kinetic_energy(m, p))
    want = 0.5 * np.sum(np.asarray(p) ** 2 * np.asarray(inv), axis=-1)
    np.testing.assert_allclose(ke, want, rtol=1e-12)
    assert psharp(m, p).shape == (c, d)


class TestLowRankMetric:
    """Low-rank+diag kinetic energy: algebraic parity with the dense metric
    built from the same M^-1, exact momentum covariance, estimator sanity."""

    def _mk(self, d=12, r=3, seed=0):
        from inplacedhmc_tpu.core.metric import LowRankMetric
        rng = np.random.default_rng(seed)
        diag_inv = jnp.asarray(rng.gamma(3.0, size=d) + 0.3)
        a = rng.normal(size=(d, r))
        u, _ = np.linalg.qr(a)                      # orthonormal columns
        w = jnp.asarray(rng.uniform(-0.7, 3.0, size=r))
        m = LowRankMetric(diag_inv=diag_inv, u=jnp.asarray(u), w=w)
        s = np.sqrt(np.asarray(diag_inv))
        minv_full = np.diag(s) @ (np.eye(d) + u @ np.diag(np.asarray(w)) @ u.T) @ np.diag(s)
        return m, jnp.asarray(minv_full)

    def test_matches_dense(self):
        from inplacedhmc_tpu.core.metric import (dense_metric, kinetic_energy,
                                                 psharp)
        m, minv_full = self._mk()
        dm = dense_metric(minv_full)
        p = jnp.asarray(np.random.default_rng(1).normal(size=(7, 12)))
        np.testing.assert_allclose(np.asarray(kinetic_energy(m, p)),
                                   np.asarray(kinetic_energy(dm, p)),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(psharp(m, p)),
                                   np.asarray(psharp(dm, p)), rtol=1e-5,
                                   atol=1e-6)

    def test_momentum_covariance(self):
        from inplacedhmc_tpu.core.metric import sample_momentum
        m, minv_full = self._mk()
        p = sample_momentum(m, jax.random.PRNGKey(0), (200_000, 12),
                            jnp.float64)
        emp = np.cov(np.asarray(p).T)
        mass = np.linalg.inv(np.asarray(minv_full))
        np.testing.assert_allclose(emp, mass, atol=0.05 * np.abs(mass).max())

    def test_estimator_recovers_low_rank_structure(self):
        from inplacedhmc_tpu.core.metric import (estimate_low_rank_metric,
                                                 psharp)
        d, r = 30, 2
        rng = np.random.default_rng(3)
        # target covariance: identity + two strong principal directions
        u_true, _ = np.linalg.qr(rng.normal(size=(d, r)))
        cov = np.eye(d) + u_true @ np.diag([24.0, 15.0]) @ u_true.T
        chol = np.linalg.cholesky(cov)
        draws = rng.normal(size=(60, 64, d)) @ chol.T
        m = estimate_low_rank_metric(jnp.asarray(draws), lam=0.1, rank=r)
        # M^-1 should approximate cov: psharp of a vector ~ cov @ v
        v = rng.normal(size=(1, d))
        got = np.asarray(psharp(m, jnp.asarray(v)))[0]
        want = cov @ v[0]
        cossim = got @ want / (np.linalg.norm(got) * np.linalg.norm(want))
        # whitening by the signal-contaminated diagonal distorts directions a
        # little, so rank-2 reconstruction is approximate, not exact
        assert cossim > 0.85, cossim
        # the recovered principal subspace aligns with the true one
        proj = np.linalg.norm(np.asarray(m.u).T @ u_true, ord=2)
        assert proj > 0.9, proj

    def test_sampler_end_to_end_low_rank(self):
        """Correlated 40-D Gaussian through the public driver with
        metric="low_rank": posterior moments recovered."""
        from inplacedhmc_tpu.models import mvn
        from inplacedhmc_tpu.sample import mcmc_with_warmup
        from inplacedhmc_tpu.config import default_warmup_stages

        d = 40
        rng = np.random.default_rng(5)
        u_true, _ = np.linalg.qr(rng.normal(size=(d, 2)))
        cov = np.eye(d) + u_true @ np.diag([30.0, 10.0]) @ u_true.T
        model = mvn(cov)
        stages = default_warmup_stages(metric="low_rank", rank=4,
                                       init_steps=50, middle_steps=30,
                                       doubling_stages=3,
                                       terminating_steps=40)
        out = mcmc_with_warmup(jax.random.PRNGKey(0), model, 400, 32,
                               warmup_stages=stages, dtype=jnp.float64)
        from inplacedhmc_tpu.core.metric import LowRankMetric
        assert isinstance(out.warmup_state.metric, LowRankMetric)
        q = np.asarray(out.draws).reshape(-1, d)
        np.testing.assert_allclose(q.mean(0), 0.0, atol=0.45)
        # variance along the strong principal direction (31x) is recovered
        v1 = q @ u_true[:, 0]
        assert abs(v1.var() / 31.0 - 1.0) < 0.35, v1.var()
        acc = float(np.mean(np.asarray(out.stats.acceptance_rate)))
        assert 0.6 < acc < 0.95


class TestStreamedMoments:
    """Streamed-moment estimators (O(D)/O(D²) carry) must match the
    stored-draws estimators they replace at 10k-chain×1k-dim scale."""

    def _draws(self, n=60, c=8, d=6, offset=0.0):
        rng = np.random.default_rng(7)
        a = rng.normal(size=(d, d))
        draws = rng.normal(size=(n, c, d)) @ a.T + offset
        return jnp.asarray(draws, jnp.float32)

    def _moments(self, draws, dense):
        qref = jnp.mean(draws[0], axis=0)
        flat = draws.reshape(-1, draws.shape[-1]) - qref
        cnt = jnp.asarray(float(flat.shape[0]), jnp.float32)
        s1 = jnp.sum(flat, axis=0)
        s2 = flat.T @ flat if dense else jnp.sum(flat * flat, axis=0)
        return cnt, s1, s2

    def test_variance_matches_pooled_estimator(self):
        from inplacedhmc_tpu.core.metric import (moments_variance,
                                                 regularized_variance)
        draws = self._draws()
        lam = 5.0 / draws.shape[0]
        cnt, s1, s2 = self._moments(draws, dense=False)
        got = np.asarray(moments_variance(cnt, s1, s2, lam))
        want = np.asarray(regularized_variance(draws, lam, pooled=True))
        np.testing.assert_allclose(got, want, rtol=5e-4)

    def test_variance_stable_with_large_offset(self):
        """The reference-centered form must survive |mean|/sd ~ 1e4 in f32
        (ADVICE round 1: raw one-pass moments round negative there)."""
        from inplacedhmc_tpu.core.metric import moments_variance
        draws = self._draws(offset=1e4)
        cnt, s1, s2 = self._moments(draws, dense=False)
        got = np.asarray(moments_variance(cnt, s1, s2, 0.1))
        assert np.all(got > 0)
        flat = np.asarray(draws, np.float64).reshape(-1, draws.shape[-1])
        np.testing.assert_allclose(got, flat.var(0, ddof=1), rtol=0.05)

    def test_cov_matches_pooled_estimator(self):
        from inplacedhmc_tpu.core.metric import moments_cov, regularized_cov
        draws = self._draws()
        lam = 5.0 / draws.shape[0]
        cnt, s1, gram = self._moments(draws, dense=True)
        got = np.asarray(moments_cov(cnt, s1, gram, lam))
        want = np.asarray(regularized_cov(draws, lam, pooled=True))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)

    @pytest.mark.parametrize("lam_mult", [1.0, 480.0])
    def test_low_rank_from_moments_matches_draw_estimator(self, lam_mult):
        """Parity must hold for LARGE lam too: the old from-cov path
        eigendecomposed the already-regularized covariance and shrank its
        eigenvalues AGAIN (17% off on the top eigenvalue at lam=20)."""
        from inplacedhmc_tpu.core.metric import (estimate_low_rank_metric,
                                                 low_rank_metric_from_moments)
        draws = self._draws(n=120, c=16, d=5)
        lam = lam_mult * 5.0 / draws.shape[0]
        cnt, s1, gram = self._moments(draws, dense=True)
        got = low_rank_metric_from_moments(cnt, s1, gram, lam, rank=3)
        want = estimate_low_rank_metric(draws, lam, rank=3)
        np.testing.assert_allclose(np.asarray(got.diag_inv),
                                   np.asarray(want.diag_inv), rtol=2e-3)
        np.testing.assert_allclose(np.sort(np.asarray(got.w)),
                                   np.sort(np.asarray(want.w)),
                                   rtol=1e-2, atol=1e-4)

    def test_dense_metric_survives_high_condition_number(self):
        """f32 invert-then-Cholesky NaN'd around cond ~1e7; factoring M^-1
        directly must stay finite well past that."""
        from inplacedhmc_tpu.core.metric import dense_metric, sample_momentum
        rng = np.random.default_rng(0)
        d = 50
        scales = np.geomspace(1e-1, 1e1, d)          # anisotropy, not noise
        a = rng.normal(size=(d, d)).astype(np.float64)
        q, _ = np.linalg.qr(a)
        evals = np.geomspace(1e-4, 1e4, d)           # cond(M^-1) = 1e8
        inv = (q * evals) @ q.T
        inv = 0.5 * (inv + inv.T)
        m = dense_metric(jnp.asarray(inv, jnp.float32))
        assert np.isfinite(np.asarray(m.mass_chol)).all()
        p = sample_momentum(m, jax.random.PRNGKey(0), (64, d), jnp.float32)
        assert np.isfinite(np.asarray(p)).all()
        # the draws actually have covariance M = inv^-1: check the top
        # whitened direction's variance is ~1 under M^-1 metric
        ke = np.asarray(0.5 * jnp.einsum("ci,ij,cj->c", p, jnp.asarray(inv, jnp.float32), p))
        assert abs(ke.mean() / (d / 2) - 1.0) < 0.3

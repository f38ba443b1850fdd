"""Metric / regularized-estimator unit tests (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np

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

"""Leapfrog unit tests: reversibility and O(eps^2) energy error (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np

from inplacedhmc_tpu.core.hamiltonian import batched_logdensity_and_grad, joint_logdensity
from inplacedhmc_tpu.core.metric import diag_metric, dense_metric, kinetic_energy
from inplacedhmc_tpu.core.state import EvalPoint, PhasePoint
from inplacedhmc_tpu.models import std_normal
from inplacedhmc_tpu.ops.integrator import leapfrog


def _setup(c=16, d=8, seed=0):
    key = jax.random.PRNGKey(seed)
    kq, kp, km = jax.random.split(key, 3)
    pot = batched_logdensity_and_grad(std_normal(d).logp)
    q = jax.random.normal(kq, (c, d))
    p = jax.random.normal(kp, (c, d))
    metric = diag_metric(jnp.exp(jax.random.normal(km, (d,)) * 0.3))
    logp, grad = pot(q)
    z = PhasePoint(Q=EvalPoint(q=q, logp=logp, grad=grad), p=p)
    return pot, metric, z


def test_reversibility():
    pot, metric, z = _setup()
    eps = 0.13
    z1 = leapfrog(pot, metric, z, eps)
    z2 = leapfrog(pot, metric, z1, -eps)
    np.testing.assert_allclose(np.asarray(z2.Q.q), np.asarray(z.Q.q), atol=1e-10)
    np.testing.assert_allclose(np.asarray(z2.p), np.asarray(z.p), atol=1e-10)


def test_energy_error_scales_as_eps_squared():
    pot, metric, z = _setup()
    h0 = joint_logdensity(metric, z.Q.logp, z.p)

    def energy_err(eps, n_steps):
        zz = z
        for _ in range(n_steps):
            zz = leapfrog(pot, metric, zz, eps)
        return jnp.max(jnp.abs(joint_logdensity(metric, zz.Q.logp, zz.p) - h0))

    # fixed integration time T = 0.64; halving eps should ~quarter the error
    e1 = float(energy_err(0.08, 8))
    e2 = float(energy_err(0.04, 16))
    assert e2 < e1 / 2.5


def test_dense_metric_leapfrog_matches_whitened_diag():
    """With M^-1 = A A^T dense, leapfrog must equal the diagonal computation in
    the eigenbasis — checked indirectly via exact harmonic-oscillator energy
    conservation symmetry: forward+back reversibility with a dense metric."""
    key = jax.random.PRNGKey(3)
    d = 6
    a = jax.random.normal(key, (d, d)) * 0.3 + jnp.eye(d)
    inv = a @ a.T
    metric = dense_metric(inv)
    pot = batched_logdensity_and_grad(std_normal(d).logp)
    q = jax.random.normal(jax.random.PRNGKey(4), (5, d))
    p = jax.random.normal(jax.random.PRNGKey(5), (5, d))
    logp, grad = pot(q)
    z = PhasePoint(Q=EvalPoint(q=q, logp=logp, grad=grad), p=p)
    z1 = leapfrog(pot, metric, z, 0.11)
    z2 = leapfrog(pot, metric, z1, -0.11)
    np.testing.assert_allclose(np.asarray(z2.Q.q), np.asarray(z.Q.q), atol=1e-9)


def test_nonfinite_logp_becomes_divergence_sentinel():
    def logp(q):
        return jnp.where(q[0] > 1.0, jnp.nan, -0.5 * jnp.sum(q * q))

    pot = batched_logdensity_and_grad(logp)
    q = jnp.asarray([[2.0, 0.0], [0.5, 0.0]])
    lp, g = pot(q)
    assert np.isneginf(np.asarray(lp)[0]) and np.isfinite(np.asarray(lp)[1])
    assert np.all(np.asarray(g)[0] == 0.0)
    # joint density guards non-finite kinetic energy too (kinetic_energy.jl:107-112)
    metric = diag_metric(jnp.ones(2))
    bad_p = jnp.asarray([[jnp.inf, 0.0], [0.0, 0.0]])
    j = joint_logdensity(metric, lp, bad_p)
    assert np.isneginf(np.asarray(j)[0])

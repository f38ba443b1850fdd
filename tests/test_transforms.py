"""Bijector / transformed-model tests: inverses, Jacobians (vs autodiff),
and posterior correctness through a constrained parameterization."""

import jax
import jax.numpy as jnp
import numpy as np

from inplacedhmc_tpu.models.transforms import (Bijector, identity, interval,
                                               lower_bounded, positive,
                                               simplex, transformed_model)
from inplacedhmc_tpu.sample import mcmc_with_warmup
from inplacedhmc_tpu.config import default_warmup_stages


def _check_bijector(bij, y):
    y = jnp.asarray(y)
    x = bij.forward(y)
    y2 = bij.inverse(x)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=1e-8)
    # total log-Jacobian vs autodiff log|det dforward/dy|
    jac = jax.jacfwd(bij.forward)(y)
    jac = jnp.atleast_2d(jac)
    if jac.shape[0] != jac.shape[1]:  # simplex: drop the dependent last row
        jac = jac[:-1, :]
    want = float(jnp.linalg.slogdet(jac)[1])
    got = float(bij.log_jac(y))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_bijector_inverses_and_jacobians():
    rng = np.random.default_rng(0)
    _check_bijector(positive(3), rng.normal(size=3))
    _check_bijector(interval(-2.0, 5.0, 4), rng.normal(size=4))
    _check_bijector(lower_bounded(1.5, 2), rng.normal(size=2))
    _check_bijector(simplex(3), rng.normal(size=3))


def test_simplex_forward_is_simplex():
    y = jnp.asarray(np.random.default_rng(1).normal(size=5))
    x = simplex(5).forward(y)
    assert x.shape == (6,)
    np.testing.assert_allclose(float(jnp.sum(x)), 1.0, atol=1e-6)
    assert np.all(np.asarray(x) > 0)


def test_transformed_model_posterior():
    """Sample sigma ~ constrained positive with known lognormal posterior:
    logp_natural(sigma) = lognormal(mu=0.5, s=0.3) density (without Jacobian,
    which the transform supplies) -> posterior of log sigma is N(0.5, 0.3^2)."""
    mu, s = 0.5, 0.3

    def logp_nat(params):
        sig = params["sigma"]
        return -0.5 * ((jnp.log(sig) - mu) / s) ** 2 - jnp.log(sig)

    model = transformed_model("lognormal_sigma", {"sigma": positive()}, logp_nat)
    assert model.dim == 1
    res = mcmc_with_warmup(
        jax.random.PRNGKey(0), model, n_draws=800, n_chains=8,
        warmup_stages=default_warmup_stages(init_steps=30, middle_steps=25,
                                            doubling_stages=2,
                                            terminating_steps=20),
        dtype=jnp.float64)
    sig = np.asarray(res.warmup_state.z.q)  # unconstrained y = log sigma
    y_draws = np.asarray(res.draws)[..., 0].ravel()
    np.testing.assert_allclose(y_draws.mean(), mu, atol=0.05)
    np.testing.assert_allclose(y_draws.std(), s, atol=0.05)
    post = model.constrain(res.draws)
    assert np.all(np.asarray(post["sigma"]) > 0)


def test_transformed_model_multiparam():
    """Mixed spec: scalar + bounded + vector; check flat layout and constrain."""
    spec = {"mu": identity(), "phi": interval(-1, 1), "z": identity(3)}

    def logp_nat(p):
        return (-0.5 * p["mu"] ** 2 - 0.5 * jnp.sum(p["z"] ** 2)
                - 0.5 * (jnp.arctanh(p["phi"]) / 2.0) ** 2)

    model = transformed_model("mixed", spec, logp_nat)
    assert model.dim == 5
    q = jnp.asarray(np.random.default_rng(2).normal(size=(4, 5)))
    out = model.constrain(q)
    assert out["mu"].shape == (4,)
    assert out["phi"].shape == (4,)
    assert np.all(np.abs(np.asarray(out["phi"])) < 1)
    assert out["z"].shape == (4, 3)
    val = model.logp(q[0])
    assert np.isfinite(float(val))

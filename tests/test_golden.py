"""Golden-reference correctness pins (VERDICT r2 next #7).

BASELINE's correctness bar is "posterior moments match DynamicHMC within MC
error" (`/root/repo/BASELINE.json:5`).  These tests assert the sampler's
moments against frozen goldens computed by sampler-independent methods
(tests/make_goldens.py): exact 2-D quadrature for eight schools, Laplace +
importance sampling (IS ESS ~3.2M) for a logistic-regression fixture.  The
tolerance is MC-error-based: 5 standard errors from the sampler's own bulk
ESS (the golden's error is 1-2 orders smaller), with a small absolute floor
for float32 quantization.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from inplacedhmc_tpu import diagnostics as diag
from inplacedhmc_tpu.models import eight_schools, logistic_regression, \
    synthetic_data
from inplacedhmc_tpu.sample import mcmc_with_warmup

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "golden")


def _load(name):
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        return json.load(f)


def _assert_moments(draws, golden_mean, golden_sd, label, floor=0.02):
    """draws: [N, C] for one coordinate; assert the empirical mean is within
    5 MC standard errors (+floor) of the golden."""
    ess = float(diag.ess_bulk(draws[:, :, None], cap=False)[0])
    emp = float(jnp.mean(draws))
    se = golden_sd / np.sqrt(max(ess, 1.0))
    tol = 5.0 * se + floor
    assert abs(emp - golden_mean) < tol, \
        f"{label}: emp {emp:.4f} vs golden {golden_mean:.4f} " \
        f"(tol {tol:.4f}, ess {ess:.0f})"
    return ess


def test_eight_schools_matches_quadrature_golden():
    g = _load("eight_schools.json")
    model = eight_schools()
    res = mcmc_with_warmup(jax.random.PRNGKey(3), model, 1500, 32,
                           use_pallas="off")
    q = jnp.asarray(res.draws)                       # [N, C, 10]
    _assert_moments(q[:, :, 0], g["mu_mean"], g["mu_sd"], "mu")
    _assert_moments(q[:, :, 1], g["log_tau_mean"], g["log_tau_sd"],
                    "log_tau")
    # constrained theta means via the model's own constrain map
    con = model.constrain(q)
    for j in range(8):
        _assert_moments(con["theta"][:, :, j], g["theta_mean"][j],
                        g["theta_sd"][j], f"theta_{j}", floor=0.08)
    # posterior sd of mu (a second-moment pin, catches too-narrow sampling)
    emp_sd = float(jnp.std(q[:, :, 0]))
    assert abs(emp_sd - g["mu_sd"]) < 0.35 * g["mu_sd"], (emp_sd, g["mu_sd"])


def test_logistic_matches_is_golden():
    g = _load("logistic_500x8.json")
    x, y, _ = synthetic_data(jax.random.PRNGKey(g["data_key"]), g["n_obs"],
                             g["n_feat"], jnp.float32)
    model = logistic_regression(x, y, prior_scale=g["prior_scale"])
    res = mcmc_with_warmup(jax.random.PRNGKey(5), model, 600, 16,
                           use_pallas="off")
    q = jnp.asarray(res.draws)
    for j in range(g["n_feat"]):
        _assert_moments(q[:, :, j], g["beta_mean"][j], g["beta_sd"][j],
                        f"beta_{j}", floor=0.01)
        emp_sd = float(jnp.std(q[:, :, j]))
        assert abs(emp_sd - g["beta_sd"][j]) < 0.3 * g["beta_sd"][j], \
            (j, emp_sd, g["beta_sd"][j])

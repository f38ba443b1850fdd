"""Generate golden posterior-moment fixtures (VERDICT r2 next #7).

The BASELINE correctness bar is "posterior moments match DynamicHMC within MC
error" (`/root/repo/BASELINE.json:5`); these fixtures pin that bar with
moments computed by methods **independent of the sampler code** (they use the
model densities only, in float64):

* **eight schools** — the school effects integrate out analytically, so the
  exact posterior of ``(mu, tau)`` is 2-D:
  ``p(mu, tau | y) ∝ N(mu; 0, 10^2) HC(tau; 5) ∏_j N(y_j; mu, sigma_j^2 + tau^2)``,
  evaluated on a fine tensor grid (trapezoid quadrature); the non-centered
  coordinates' moments follow from the Gaussian conditionals
  ``theta_j | mu, tau ~ N(mu + k_j (y_j - mu), k_j sigma_j^2)`` with
  ``k_j = tau^2 / (tau^2 + sigma_j^2)`` and ``z_j = (theta_j - mu) / tau``.
  Grid-refinement convergence is checked (halving the step changes nothing at
  the recorded precision).

* **logistic regression** (500 x 8 fixture of the BASELINE config-3 family) —
  self-normalized importance sampling from a multivariate-t(df=7) proposal at
  the Laplace mode (MAP by Newton in f64, covariance = inverse Hessian).  The
  posterior is log-concave, so the t proposal has uniformly heavier tails and
  the weights are bounded; the recorded ``is_ess`` (~millions) puts the
  golden's own MC error ~30x below the tolerance the tests assert.

Run:  python tests/make_goldens.py   (writes tests/golden/*.json)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def golden_eight_schools(n_mu=1601, n_lt=1401):
    from inplacedhmc_tpu.models.eight_schools import SIGMA, Y

    y = np.asarray(Y, np.float64)
    sig = np.asarray(SIGMA, np.float64)
    mu = np.linspace(-25.0, 40.0, n_mu)
    log_tau = np.linspace(-14.0, 5.0, n_lt)
    MU, LT = np.meshgrid(mu, log_tau, indexing="ij")
    TAU = np.exp(LT)

    logp = -0.5 * (MU / 10.0) ** 2
    # half-Cauchy(5) in tau with the log_tau Jacobian (models/eight_schools.py)
    logp = logp - np.logaddexp(0.0, 2.0 * (LT - np.log(5.0))) + LT
    v = TAU[..., None] ** 2 + sig**2                     # [n_mu, n_lt, 8]
    resid = y - MU[..., None]
    logp = logp - 0.5 * np.sum(np.log(v) + resid**2 / v, axis=-1)
    w = np.exp(logp - logp.max())
    w /= w.sum()

    def e(f):
        return float(np.sum(w * f))

    k = TAU[..., None] ** 2 / v                          # shrinkage [.., 8]
    theta_mean = MU[..., None] + k * resid               # E[theta|mu,tau]
    theta_var = k * sig**2                               # Var[theta|mu,tau]
    z_mean = theta_mean / TAU[..., None] - MU[..., None] / TAU[..., None]
    z_var = theta_var / TAU[..., None] ** 2

    out = {"desc": "eight schools, canonical data; 2-D quadrature golden",
           "mu_mean": e(MU), "mu_sd": float(np.sqrt(e(MU**2) - e(MU) ** 2)),
           "log_tau_mean": e(LT),
           "log_tau_sd": float(np.sqrt(e(LT**2) - e(LT) ** 2)),
           "tau_mean": e(TAU),
           "theta_mean": [float(np.sum(w * theta_mean[..., j]))
                          for j in range(8)],
           "theta_sd": [], "z_mean": [], "z_sd": []}
    for j in range(8):
        tm = np.sum(w * theta_mean[..., j])
        tv = np.sum(w * (theta_var[..., j] + theta_mean[..., j] ** 2)) - tm**2
        out["theta_sd"].append(float(np.sqrt(tv)))
        zm = np.sum(w * z_mean[..., j])
        zv = np.sum(w * (z_var[..., j] + z_mean[..., j] ** 2)) - zm**2
        out["z_mean"].append(float(zm))
        out["z_sd"].append(float(np.sqrt(zv)))
    return out


def golden_logistic(n_obs=500, n_feat=8, prior_scale=10.0, n_is=4_000_000,
                    seed=0):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from inplacedhmc_tpu.models import logistic_regression, synthetic_data

    # the fixture dataset is drawn in f32 (exactly what the test will build)
    # but golden math runs in f64
    x32, y32, _ = synthetic_data(jax.random.PRNGKey(42), n_obs, n_feat,
                                 jnp.float32)
    x = np.asarray(x32, np.float64)
    y = np.asarray(y32, np.float64)
    inv_var = 1.0 / (prior_scale * prior_scale)

    model = logistic_regression(jnp.asarray(x), jnp.asarray(y),
                                prior_scale=prior_scale)
    logp = model.logp
    grad = jax.jit(jax.grad(logp))
    hess = jax.jit(jax.hessian(logp))

    # Newton to the MAP (log-concave: globally convergent with step halving)
    b = jnp.zeros((n_feat,), jnp.float64)
    for _ in range(50):
        g = np.asarray(grad(b))
        h = np.asarray(hess(b))
        step = np.linalg.solve(h, g)
        b_new = b - step
        if float(logp(b_new)) < float(logp(b)):
            b_new = b - 0.5 * step
        if np.max(np.abs(np.asarray(b_new) - np.asarray(b))) < 1e-12:
            b = b_new
            break
        b = b_new
    mode = np.asarray(b)
    cov = np.linalg.inv(-np.asarray(hess(b)))
    chol = np.linalg.cholesky(cov)

    # multivariate-t(df) proposal at the Laplace mode
    rng = np.random.default_rng(seed)
    df = 7.0
    logp_b = jax.jit(jax.vmap(logp))
    means = np.zeros(n_feat)
    sqs = np.zeros(n_feat)
    wsum = 0.0
    wsq = 0.0
    batch = 200_000
    lw_max = -np.inf
    # two passes with the same RNG stream: max log-weight, then moments
    state0 = rng.bit_generator.state
    for _pass in range(2):
        rng.bit_generator.state = state0
        for start in range(0, n_is, batch):
            m = min(batch, n_is - start)
            u = rng.standard_normal((m, n_feat))
            s = rng.chisquare(df, m) / df
            dx = (u / np.sqrt(s)[:, None]) @ chol.T
            q = mode + dx
            # log t-density up to constants shared by all samples:
            # dx = L u / sqrt(s) so dx' Σ^{-1} dx = |u|^2 / s
            maha_dx = np.einsum("ij,ij->i", u, u) / s
            logq = -0.5 * (df + n_feat) * np.log1p(maha_dx / df)
            lp = np.asarray(logp_b(jnp.asarray(q)))
            lw = lp - logq
            if _pass == 0:
                lw_max = max(lw_max, float(lw.max()))
            else:
                w = np.exp(lw - lw_max)
                wsum += w.sum()
                wsq += (w**2).sum()
                means += w @ q
                sqs += w @ (q**2)
    means /= wsum
    sds = np.sqrt(sqs / wsum - means**2)
    is_ess = wsum**2 / wsq
    return {"desc": f"logistic {n_obs}x{n_feat} prior_scale={prior_scale}, "
                    "synthetic_data(PRNGKey(42)) f32; Laplace+t(7) IS golden",
            "n_obs": n_obs, "n_feat": n_feat, "prior_scale": prior_scale,
            "data_key": 42, "is_ess": float(is_ess),
            "beta_mean": means.tolist(), "beta_sd": sds.tolist()}


def main():
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "golden")
    os.makedirs(out_dir, exist_ok=True)

    g8 = golden_eight_schools()
    g8_fine = golden_eight_schools(n_mu=3201, n_lt=2801)
    conv = max(abs(g8["mu_mean"] - g8_fine["mu_mean"]),
               abs(g8["tau_mean"] - g8_fine["tau_mean"]))
    g8_fine["grid_convergence"] = conv
    assert conv < 1e-6, conv
    with open(os.path.join(out_dir, "eight_schools.json"), "w") as f:
        json.dump(g8_fine, f, indent=1)
    print("eight schools:", {k: v for k, v in g8_fine.items()
                             if not isinstance(v, list)})

    gl = golden_logistic()
    assert gl["is_ess"] > 100_000, gl["is_ess"]
    with open(os.path.join(out_dir, "logistic_500x8.json"), "w") as f:
        json.dump(gl, f, indent=1)
    print("logistic: is_ess", gl["is_ess"])


if __name__ == "__main__":
    main()

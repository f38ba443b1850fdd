"""Eight-schools hierarchical model — BASELINE config 4 (1k vmapped chains/chip).

Non-centered parameterization (the HMC-friendly form): parameters are
``(mu, log_tau, z_1..z_8)``; school effects ``theta_j = mu + tau * z_j``.
"""

from __future__ import annotations

import functools as _functools

import jax.numpy as jnp

import numpy as _np

from .base import Model

# Classic data (Rubin 1981): treatment effects and standard errors.
# Host numpy, NOT device arrays: `import inplacedhmc_tpu` pulls this module
# in, and materializing device constants here would initialize the backend
# before the user can configure it (the package keeps imports cheap).
Y = _np.asarray([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
SIGMA = _np.asarray([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])


def _tile_logp(q, refs):
    """Whole-tile log density for the Pallas whole-tree kernel
    (ops/tree_pallas.py): layout [mu, log_tau, z_1..z_8] with Y/SIGMA data
    rows aligned to the z lanes; gradient comes from in-kernel autodiff."""
    y = refs["y"][0:1, :]
    sig = refs["sig"][0:1, :]
    om = refs["obs_mask"][0:1, :]
    mu = q[:, 0:1]
    log_tau = q[:, 1:2]
    tau = jnp.exp(log_tau)
    theta = mu + tau * q                      # meaningful only where om == 1
    # half-Cauchy in log_tau form: (tau/5)^2 overflows f32 at log_tau ~ 46
    # while the true log density is finite to ~88 — spurious divergences
    lp = -0.5 * (mu / 10.0) ** 2 \
        - jnp.logaddexp(0.0, 2.0 * (log_tau - jnp.log(5.0))) + log_tau
    lp = lp - 0.5 * jnp.sum(om * q * q, axis=1, keepdims=True)
    resid = (y - theta) / (sig + (1.0 - om))
    lp = lp - 0.5 * jnp.sum(om * resid * resid, axis=1, keepdims=True)
    return lp


def _tile_data(dim):
    n = int(Y.shape[0])
    y = _np.zeros((1, dim), _np.float32)
    sig = _np.zeros((1, dim), _np.float32)
    om = _np.zeros((1, dim), _np.float32)
    y[0, 2:2 + n] = _np.asarray(Y)
    sig[0, 2:2 + n] = _np.asarray(SIGMA)
    om[0, 2:2 + n] = 1.0
    return {"y": y, "sig": sig, "obs_mask": om}


@_functools.lru_cache(maxsize=None)
def eight_schools() -> Model:
    """Canonical priors (Stan's example model): mu ~ N(0, 10^2),
    tau ~ half-Cauchy(0, 5) sampled as log_tau with the +log_tau Jacobian,
    non-centered z ~ N(0, 1).  Expected posterior: mu ~= 7.5-8,
    tau median ~= 3."""
    n = Y.shape[0]
    dim = 2 + n

    def logp(q):
        mu, log_tau, z = q[0], q[1], q[2:]
        tau = jnp.exp(log_tau)
        theta = mu + tau * z
        lp = -0.5 * (mu / 10.0) ** 2                     # mu ~ N(0, 10^2)
        # tau ~ half-Cauchy(0, 5); log|dtau/dlog_tau| = log_tau.  Stable
        # log_tau form: (tau/5)^2 overflows f32 at log_tau ~ 46
        lp += -jnp.logaddexp(0.0, 2.0 * (log_tau - jnp.log(5.0))) + log_tau
        lp += -0.5 * jnp.sum(z * z)                      # z ~ N(0, 1)
        sig = jnp.asarray(SIGMA, q.dtype)
        yy = jnp.asarray(Y, q.dtype)
        lp += jnp.sum(-0.5 * ((yy - theta) / sig) ** 2)
        return lp

    def constrain(q):
        mu, log_tau, z = q[..., 0], q[..., 1], q[..., 2:]
        tau = jnp.exp(log_tau)
        theta = mu[..., None] + tau[..., None] * z
        return {"mu": mu, "tau": tau, "theta": theta}

    return Model(name="eight_schools", dim=dim, logp=logp, constrain=constrain,
                 structure={"kind": "tile_logp", "tile_logp": _tile_logp,
                            "data": _tile_data(dim)})

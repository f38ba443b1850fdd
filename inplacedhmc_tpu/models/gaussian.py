"""Gaussian targets: standard normal and general multivariate normal.

BASELINE config 1 (``/root/repo/BASELINE.json``): 100-dim standard multivariate
normal — the basic correctness target (posterior mean/cov within MC error).
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import Model

import functools


@functools.lru_cache(maxsize=None)
def std_normal(dim: int = 100) -> Model:
    def logp(q):
        return -0.5 * jnp.sum(q * q)

    # grad = -q: linear-gradient structure the fused Pallas leapfrog exploits.
    return Model(name=f"std_normal_{dim}", dim=dim, logp=logp,
                 structure={"kind": "diag_gaussian", "precision": jnp.ones((dim,))})


def diag_normal(variances) -> Model:
    """N(0, diag(variances)) — ill-conditioned targets for metric-adaptation tests."""
    variances = jnp.asarray(variances)
    prec = 1.0 / variances

    def logp(q):
        return -0.5 * jnp.sum(q * q * prec)

    return Model(name=f"diag_normal_{variances.shape[0]}", dim=variances.shape[0],
                 logp=logp, structure={"kind": "diag_gaussian", "precision": prec})


def mvn(cov) -> Model:
    """N(0, cov) with a dense covariance — exercises the dense-metric path."""
    cov = jnp.asarray(cov)
    prec = jnp.linalg.inv(cov)
    prec = 0.5 * (prec + prec.T)

    def logp(q):
        return -0.5 * q @ prec @ q

    return Model(name=f"mvn_{cov.shape[0]}", dim=cov.shape[0], logp=logp,
                 structure={"kind": "dense_gaussian", "precision": prec})

"""Bayesian logistic regression — BASELINE config 3 (10k obs x 50 features).

The gradient is matmul-dominated (``X^T (y - sigmoid(X b))``), which maps
straight onto the TPU MXU when vmapped over chains: the per-chain logits for
all chains form a single ``[C, D] x [D, N]`` matmul.  This model is the primary
ESS/sec benchmark target and uses the dense mass matrix path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Model


def synthetic_data(key, n_obs: int = 10_000, n_features: int = 50,
                   dtype=jnp.float32):
    """Generate a well-specified synthetic dataset with known coefficients."""
    kx, kmix, kb, ky = jax.random.split(key, 4)
    x = jax.random.normal(kx, (n_obs, n_features), dtype)
    # Mild correlation structure so the dense metric actually matters.
    # Distinct keys per draw: reusing one key would statistically couple the
    # design's correlation structure with the true coefficients.
    mix = 0.3 * jax.random.normal(kmix, (n_features, n_features), dtype)
    x = x + x @ mix / jnp.sqrt(jnp.asarray(n_features, dtype))
    beta_true = jax.random.normal(kb, (n_features,), dtype) * 0.5
    logits = x @ beta_true
    y = jax.random.bernoulli(ky, jax.nn.sigmoid(logits)).astype(dtype)
    return x, y, beta_true


def logistic_regression(x, y, prior_scale: float = 10.0) -> Model:
    """Posterior over coefficients ``b`` with N(0, prior_scale^2) priors.

    ``logp(b) = sum_i [y_i * eta_i - log(1 + e^{eta_i})] - ||b||^2/(2 s^2)``,
    with ``eta = X b``; uses the numerically stable ``log1p(exp)`` form.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    d = x.shape[1]
    inv_var = 1.0 / (prior_scale * prior_scale)

    def logp(b):
        eta = x @ b
        # y*eta - log(1+exp(eta)) = y*eta + min(0,-eta) - log1p(exp(-|eta|))
        ll = jnp.sum(y * eta - jnp.logaddexp(0.0, eta))
        return ll - 0.5 * inv_var * jnp.sum(b * b)

    return Model(name=f"logistic_{x.shape[0]}x{d}", dim=d, logp=logp,
                 structure={"kind": "logistic", "x": x, "y": y, "inv_var": inv_var})

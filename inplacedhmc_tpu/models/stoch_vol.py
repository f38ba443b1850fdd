"""Stochastic volatility — BASELINE config 5 (1k latent states, 10k sharded chains).

AR(1) latent log-volatility:

    h_1 ~ N(0, s^2 / (1 - phi^2)),   h_t = phi h_{t-1} + s eps_t
    r_t | h_t ~ N(0, exp(h_t))

Parameters ``q = (arctanh_phi, log_s, h_1..h_T)`` — **centered** latents:
with one observation per latent the likelihood identifies each ``h_t``
directly, so centering beats the whitened/non-centered form (measured: the
scale-whitened variant reached R-hat 5.4 / 19% divergences at T=1000 vs the
centered form's far better geometry; this is the textbook informative-data
regime where centered parameterizations win).  The AR(1) prior is expressed
with vectorized shifts, not a scan, so the gradient stays one fused
elementwise pass — the large-D config that stresses HBM bandwidth in the
leapfrog.  High ``delta`` (0.9+) recommended.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Model


def synthetic_returns(key, n_steps: int = 1000, phi: float = 0.98,
                      s: float = 0.15, dtype=jnp.float32):
    kh, kr = jax.random.split(key)
    eps = jax.random.normal(kh, (n_steps,), dtype) * s

    def step(h, e):
        h2 = phi * h + e
        return h2, h2

    h0 = eps[0] / jnp.sqrt(1.0 - phi * phi) / s if s else 0.0
    _, h = jax.lax.scan(step, jnp.asarray(h0, dtype), eps)
    r = jax.random.normal(kr, (n_steps,), dtype) * jnp.exp(0.5 * h)
    return r


def stoch_vol(returns) -> Model:
    returns = jnp.asarray(returns)
    t = returns.shape[0]
    dim = 2 + t

    def logp(q):
        raw_phi, log_s, h = q[0], q[1], q[2:]
        phi = jnp.tanh(raw_phi)              # phi in (-1, 1)
        s = jnp.exp(log_s)
        r = jnp.asarray(returns, q.dtype)
        # priors: raw_phi ~ N(1.5, 1), log_s ~ N(-2, 1)
        lp = -0.5 * (raw_phi - 1.5) ** 2 - 0.5 * (log_s + 2.0) ** 2
        # AR(1) prior on h with innovation sd s, stationary init
        one_m_phi2 = 1.0 - phi * phi
        lp += 0.5 * jnp.log(one_m_phi2) - jnp.asarray(t, q.dtype) * log_s
        lp += -0.5 * one_m_phi2 * (h[0] / s) ** 2
        innov = (h[1:] - phi * h[:-1]) / s
        lp += -0.5 * jnp.sum(innov * innov)
        # observation model
        lp += jnp.sum(-0.5 * (h + r * r * jnp.exp(-h)))
        return lp

    def constrain(q):
        raw_phi, log_s, h = q[..., 0], q[..., 1], q[..., 2:]
        return {"phi": jnp.tanh(raw_phi), "s": jnp.exp(log_s), "h": h}

    return Model(name=f"stoch_vol_{t}", dim=dim, logp=logp, constrain=constrain)

"""Constrained-parameter transforms with log-Jacobians.

The reference samples on unconstrained R^D and delegates constrained
parameterizations to the external ProbabilityModels/QuasiNewtonMethods stack
(SURVEY.md L1).  This module provides the standard bijectors in-repo so users
can write models on natural parameter spaces: the sampler always sees an
unconstrained ``logp`` with the Jacobian correction folded in.

Usage::

    spec = {"mu": identity(), "sigma": positive(), "theta": interval(0, 1)}
    model = transformed_model("my_model", spec, logp_natural)

``logp_natural`` receives a dict of *natural*-space parameters; the returned
``Model.logp`` maps a flat unconstrained vector through the bijectors, adds
the total ``log|dx/dy|``, and ``Model.constrain`` maps draws back for
reporting.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

import jax.numpy as jnp

from .base import Model


@dataclasses.dataclass(frozen=True)
class Bijector:
    """y (unconstrained, size k) -> x (natural); ``log_jac(y)`` returns the
    *total* log|dx/dy| contribution (a scalar)."""

    name: str
    forward: Callable
    log_jac: Callable
    inverse: Callable
    size: int = 1
    out_size: int = None  # natural-space size; defaults to `size`

    def __post_init__(self):
        if self.out_size is None:
            object.__setattr__(self, "out_size", self.size)


def identity(size: int = 1) -> Bijector:
    return Bijector("identity", lambda y: y, lambda y: 0.0, lambda x: x, size)


def positive(size: int = 1) -> Bijector:
    """x = exp(y): the log transform for scales/variances."""
    return Bijector("positive", jnp.exp, jnp.sum, jnp.log, size)


def interval(lo: float, hi: float, size: int = 1) -> Bijector:
    """x = lo + (hi-lo)*sigmoid(y): bounded parameters (probabilities, AR
    coefficients, correlations)."""
    if not hi > lo:
        # a swapped-argument typo would otherwise surface only as
        # log(negative) = NaN in every logp — frozen chains, no pointer here
        raise ValueError(f"interval requires hi > lo, got ({lo}, {hi})")
    width = hi - lo

    def fwd(y):
        return lo + width / (1.0 + jnp.exp(-y))

    def log_jac(y):
        # sum of log(width) + log sigmoid(y) + log sigmoid(-y)
        return jnp.sum(jnp.log(width) - jnp.logaddexp(0.0, -y)
                       - jnp.logaddexp(0.0, y))

    def inv(x):
        u = (x - lo) / width
        return jnp.log(u) - jnp.log1p(-u)

    return Bijector("interval", fwd, log_jac, inv, size)


def lower_bounded(lo: float, size: int = 1) -> Bijector:
    """x = lo + exp(y)."""
    return Bijector("lower_bounded", lambda y: lo + jnp.exp(y), jnp.sum,
                    lambda x: jnp.log(x - lo), size)


def simplex(k_unconstrained: int) -> Bijector:
    """Stick-breaking: ``k`` unconstrained values -> ``k+1`` simplex weights
    (Stan's parameterization, with its log-Jacobian)."""
    k = k_unconstrained
    offsets = jnp.log(jnp.arange(k, 0, -1.0))

    def fwd(y):
        z = 1.0 / (1.0 + jnp.exp(-(y - offsets)))
        cum = jnp.cumprod(1.0 - z)
        rem = jnp.concatenate([jnp.ones_like(z[:1]), cum[:-1]])
        head = z * rem
        return jnp.concatenate([head, cum[-1:]])

    def log_jac(y):
        ys = y - offsets
        log_z = -jnp.logaddexp(0.0, -ys)
        log_1mz = -jnp.logaddexp(0.0, ys)
        cum_log_rem = jnp.concatenate(
            [jnp.zeros_like(ys[:1]), jnp.cumsum(log_1mz[:-1])])
        # Stan stick-breaking: log|J| = sum_k log z_k + log(1-z_k) + log rem_k
        return jnp.sum(log_z + log_1mz + cum_log_rem)

    def inv(x):
        cum = jnp.concatenate([jnp.zeros_like(x[:1]), jnp.cumsum(x[:-1])])[:k]
        z = x[:k] / (1.0 - cum)
        return jnp.log(z) - jnp.log1p(-z) + offsets

    return Bijector("simplex", fwd, log_jac, inv, k, out_size=k + 1)


Spec = Dict[str, Bijector]


def _layout(spec: Spec) -> Tuple[int, Dict[str, Tuple[int, int]]]:
    offsets = {}
    pos = 0
    for name, bij in spec.items():
        offsets[name] = (pos, bij.size)
        pos += bij.size
    return pos, offsets


def transformed_model(name: str, spec: Spec, logp_natural: Callable) -> Model:
    """Build a :class:`Model` from a bijector spec + natural-space log density.

    ``logp_natural(params: dict) -> scalar`` with params in natural space;
    scalar-sized non-simplex parameters arrive as scalars, the rest as arrays.
    The flat unconstrained dimension is the sum of bijector sizes.
    """
    dim, offsets = _layout(spec)

    def logp(q):
        params = {}
        jac = 0.0
        for pname, bij in spec.items():
            start, size = offsets[pname]
            y = q[start:start + size]
            x = bij.forward(y)
            params[pname] = x[0] if (size == 1 and bij.out_size == 1) else x
            jac = jac + bij.log_jac(y)
        return logp_natural(params) + jac

    def constrain(q):
        out = {}
        for pname, bij in spec.items():
            start, size = offsets[pname]
            y = q[..., start:start + size]
            if bij.out_size == size:
                x = bij.forward(y)
            else:  # simplex: vectorize over leading axes
                import jax
                f = bij.forward
                for _ in range(y.ndim - 1):
                    f = jax.vmap(f)
                x = f(y)
            out[pname] = x[..., 0] if (size == 1 and bij.out_size == 1) else x
        return out

    return Model(name=name, dim=dim, logp=logp, constrain=constrain)

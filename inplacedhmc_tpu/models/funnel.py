"""Neal's funnel — BASELINE config 2.

Exercises step-size adaptation and divergence handling: the neck of the funnel
forces small step sizes and produces divergent transitions, which the sampler
must report (not crash on) via the ``-inf`` sentinel semantics
(``/root/reference/src/kinetic_energy.jl:80-84,107-112``).

``q = (v, x_1..x_{dim-1})`` with ``v ~ N(0, 3^2)`` and ``x_i | v ~ N(0, e^v)``.
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import Model


def funnel(dim: int = 10, scale: float = 3.0) -> Model:
    k = dim - 1

    def logp(q):
        v = q[0]
        x = q[1:]
        lp_v = -0.5 * (v / scale) ** 2
        lp_x = -0.5 * (jnp.sum(x * x) * jnp.exp(-v) + k * v)
        return lp_v + lp_x

    return Model(name=f"funnel_{dim}", dim=dim, logp=logp)
